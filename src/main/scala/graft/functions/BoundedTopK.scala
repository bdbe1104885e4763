package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType}

/** Bounded-memory top-k aggregate: keeps the k LARGEST values of any
  * orderable input type (struct keys give lexicographic multi-column
  * ordering) in a size-k min-heap, and emits them as a descending array.
  *
  * Why not `collect_list` + `slice(sort_array(...))`? That shape ships
  * EVERY row of every group through the shuffle and holds whole groups in
  * memory before sorting — O(rows) exchanged and O(group) state. This
  * aggregate partially aggregates: each map task reduces its slice of a
  * group to at most k values before the exchange, so the shuffle carries
  * O(groups × k) regardless of group size, and merge unions two heaps in
  * O(k log k).
  *
  * Versus a window `row_number() <= k`: HONEST parity on batch
  * rank-filters — since Spark 3.5, `InferWindowGroupLimit` rewrites that
  * exact pattern into a per-partition group limit, so the window side
  * ALSO exchanges only ~k rows per (group × partition) (measured tie at
  * 5M rows, 15 groups: 0.28 s heap vs 0.20 s window, both noise-bound).
  * Where the aggregate genuinely wins:
  *   - STREAMING: rank windows are unsupported on streaming Datasets;
  *     this is a plain aggregate, so a streaming `groupBy().agg()` keeps
  *     a standing top-k with ONE O(k) state row per group
  *     (`StreamTopKSpec`) — the continuous-leaderboard shape has no
  *     window-function equivalent at all;
  *   - COMPOSITION: it can sit beside count/sum/max in the same
  *     `agg(...)` pass, where a window needs its own sort + second pass;
  *   - SHAPE: emits the group's top-k as one array row (no re-group for
  *     array consumers), and the WindowGroupLimit rewrite only fires for
  *     the literal rank-predicate pattern — the aggregate's bound is
  *     unconditional.
  *
  * Determinism contract: ties must be broken by the key itself (make the
  * key unique, e.g. `struct(score, id)`); equal keys beyond k are dropped
  * arbitrarily otherwise. Nulls are ignored (SQL aggregate convention).
  *
  * Serialization: each element is projected to an UnsafeRow over
  * `[child.dataType]` and length-prefixed — the standard
  * TypedImperativeAggregate buffer discipline (cf. Spark's own
  * `ApproximatePercentile`/`CollectList` which likewise serialize opaque
  * buffers between partial and final aggregation).
  */
case class BoundedTopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[Any]]
  with UnaryLike[Expression] {

  require(k > 0, s"bounded_top_k requires k > 0, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    TypeUtils.checkForOrderingExpr(child.dataType, prettyName)

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_top_k"

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  // PriorityQueue dequeues the MAX of its ordering; reversing makes the
  // head the smallest retained value — the eviction candidate.
  override def createAggregationBuffer(): mutable.PriorityQueue[Any] =
    new mutable.PriorityQueue[Any]()(ordering.reverse)

  private def offer(buffer: mutable.PriorityQueue[Any], v: Any): Unit = {
    if (buffer.size < k) {
      buffer.enqueue(v)
    } else if (ordering.gt(v, buffer.head)) {
      buffer.dequeue()
      buffer.enqueue(v)
    }
  }

  override def update(
      buffer: mutable.PriorityQueue[Any],
      input: InternalRow): mutable.PriorityQueue[Any] = {
    val v = child.eval(input)
    // copyValue: the evaluated value may alias the current input row's
    // unsafe buffer (structs/strings/arrays); the heap outlives the row
    if (v != null) offer(buffer, InternalRow.copyValue(v))
    buffer
  }

  override def merge(
      buffer: mutable.PriorityQueue[Any],
      other: mutable.PriorityQueue[Any]): mutable.PriorityQueue[Any] = {
    other.foreach(offer(buffer, _))
    buffer
  }

  override def eval(buffer: mutable.PriorityQueue[Any]): Any =
    new GenericArrayData(buffer.toArray.sorted(ordering.reverse))

  override def serialize(buffer: mutable.PriorityQueue[Any]): Array[Byte] = {
    val proj = UnsafeProjection.create(Array(child.dataType))
    val out = new ByteArrayOutputStream()
    val dos = new DataOutputStream(out)
    val holder = new Array[Any](1)
    buffer.foreach { v =>
      holder(0) = v
      val row = proj(InternalRow.fromSeq(holder.toIndexedSeq))
      dos.writeInt(row.getSizeInBytes)
      row.writeToStream(dos, null)
    }
    dos.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Any] = {
    val buffer = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) {
      val len = bb.getInt
      val rowBytes = new Array[Byte](len)
      bb.get(rowBytes)
      val row = new UnsafeRow(1)
      row.pointTo(rowBytes, len)
      buffer.enqueue(InternalRow.copyValue(row.get(0, child.dataType)))
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedTopK =
    copy(child = newChild)
}

object BoundedTopK {
  /** Aggregate Column: descending array of the k largest `key` values. */
  def apply(key: Column, k: Int): Column =
    ColumnBridge.column(BoundedTopK(ColumnBridge.expression(key), k).toAggregateExpression())
}
