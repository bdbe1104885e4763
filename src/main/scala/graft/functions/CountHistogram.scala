package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Exact value-count HISTOGRAM aggregate: `array<struct<v:bigint,
  * c:bigint>>` sorted by value — the distributed primitive behind the
  * round-11 exact-percentile rework (q34/q54): reduce the rows to a
  * histogram FIRST (state bounded by the value DOMAIN, never the row
  * count), read exact order statistics off the cumulative counts after.
  *
  * As a `TypedImperativeAggregate` it partially aggregates (each map task
  * forwards one histogram per group, counts merge by key) — and, unlike
  * the batch groupBy(value)+window form, it is a plain aggregate, so a
  * STREAMING `groupBy(g).agg(count_histogram(v))` keeps a standing exact
  * histogram with ONE state row per group (`StreamStatsSpec`): exact
  * streaming percentiles with bounded state, which the window/sort
  * formulation cannot express on a stream at all.
  *
  * Nulls are ignored (SQL aggregate convention); an all-null group
  * produces an empty array. Buffer serialization is 16 bytes per distinct
  * value (long pairs).
  */
case class CountHistogram(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[Long]]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"count_histogram requires bigint, got $other")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("v", LongType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "count_histogram"

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty[Long]

  override def update(
      buffer: mutable.LongMap[Long], input: InternalRow): mutable.LongMap[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[Long]
      buffer.update(k, buffer.getOrElse(k, 0L) + 1L)
    }
    buffer
  }

  override def merge(
      buffer: mutable.LongMap[Long],
      other: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    other.foreach { case (k, c) => buffer.update(k, buffer.getOrElse(k, 0L) + c) }
    buffer
  }

  override def eval(buffer: mutable.LongMap[Long]): Any = {
    val keys = buffer.keys.toArray
    java.util.Arrays.sort(keys)
    val rows = new Array[AnyRef](keys.length)
    var i = 0
    while (i < keys.length) {
      rows(i) = new GenericInternalRow(Array[Any](keys(i), buffer(keys(i))))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: mutable.LongMap[Long]): Array[Byte] = {
    val out = new ByteArrayOutputStream(buffer.size * 16)
    val dos = new DataOutputStream(out)
    buffer.foreach { case (k, c) => dos.writeLong(k); dos.writeLong(c) }
    dos.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val buffer = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) buffer.update(bb.getLong, bb.getLong)
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountHistogram =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountHistogram =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountHistogram =
    copy(child = newChild)
}

object CountHistogram {
  /** Aggregate Column: value-sorted exact `(v, c)` histogram of a bigint. */
  def apply(value: Column): Column =
    ColumnBridge.column(CountHistogram(ColumnBridge.expression(value)).toAggregateExpression())
}
