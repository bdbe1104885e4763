package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Count-Min sketch aggregate (Cormode & Muthukrishnan 2005) with the
  * same PORTABLE md5 hashing as [[HllSketch]]: depth 4 × width 256
  * counters, row r's hash of value v = the first byte of
  * `md5("r:" || v)` — so every counter, and therefore every frequency
  * estimate, replays exactly in the DuckDB oracle.
  *
  * The frequency-sketch complement to HllSketch's cardinality: estimates
  * `count(value = v)` for ANY v after the fact from 8 KB of state per
  * group, with the one-sided guarantee `estimate >= true count` (each
  * counter only ever over-counts through collisions; taking the min over
  * the 4 rows keeps the overshoot near `2n/w` with probability
  * `1 - (1/2)^4` per probe). Exact per-value counting of a 100 TB token
  * stream needs a shuffle of every distinct token; the sketch needs ONE
  * 1024-long state row per group, merged by elementwise ADD — so
  * per-partition/per-day sketches can be persisted and summed later,
  * and the same aggregate runs unchanged in streaming aggregations.
  */
case class CmsSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  import CmsSketch.{Depth, Width}

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cms_sketch requires string input, got $other")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "cms_sketch"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](Depth * Width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
      var r = 0
      while (r < Depth) {
        buffer(r * Width + CmsSketch.column(r, bytes)) += 1L
        r += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(Depth * Width)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsSketch =
    copy(child = newChild)
}

object CmsSketch {
  /** Independent hash rows. */
  val Depth = 4

  /** Counters per row; one byte of md5 indexes a row's counter. */
  val Width = 256

  /** Row r's counter index for a value: first byte of md5("r:" || v) —
    * the per-row prefix makes the four hashes independent, and the hex
    * form (`substr(md5('r:' || v), 1, 2)`) replays in SQL. */
  def column(r: Int, valueUtf8: Array[Byte]): Int = {
    val md = tl.get()
    md.reset()
    md.update(s"$r:".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    md.update(valueUtf8)
    md.digest()(0) & 0xff
  }

  private val tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Aggregate Column: the depth×width counter array, row-major. */
  def apply(value: Column): Column =
    ColumnBridge.column(CmsSketch(ColumnBridge.expression(value)).toAggregateExpression())
}
