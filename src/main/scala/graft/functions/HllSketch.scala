package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** HyperLogLog sketch aggregate (Flajolet et al. 2007) with a PORTABLE
  * hash: p = 8 → m = 256 registers, hashed by md5 so the whole sketch —
  * every register value — replays in the DuckDB oracle from the same hex
  * digests (the q65 `Md5MinHash` discipline, applied to cardinality).
  *
  * Register mapping, from the 128-bit md5 of the value's UTF-8 bytes:
  *   - bucket  = first byte (the first two hex digits), 0..255;
  *   - rho     = (leading zero BITS of bytes 1..15) + 1, capped at
  *     [[HllSketch.RhoCap]] — the cap keeps the oracle-side dyadic sum
  *     `Σ 2^(RhoCap − r)` inside exact int64 range (256·2^47 = 2^55), so
  *     the estimate's denominator is an ORDER-INDEPENDENT integer and the
  *     raw-estimate double divides out bit-identically in both engines.
  *     (The uncapped tail would need 2^-121 terms whose double sum is
  *     rounding-order-dependent — unreplayable.)
  *
  * Why a native aggregate, not `approx_count_distinct`: Spark's built-in
  * HLL++ is neither portable (private hash, irregular bias tables) nor
  * inspectable; this sketch IS the interchange format — the register
  * array is the output, mergeable by elementwise max, identical no
  * matter how rows are partitioned, so sketches can be persisted per
  * partition/day and unioned later (the 100 TB pattern: sketch once,
  * merge cheaply forever). Works unchanged in streaming aggregations
  * (plain TypedImperativeAggregate — the BoundedTopK story).
  *
  * State is one 256-byte array per group; update is one md5 + two table
  * lookups per row; merge is 256 byte-max ops.
  */
case class HllSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  import HllSketch.{M, RhoCap}

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"hll_sketch requires string input, got $other")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "hll_sketch"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  @transient private lazy val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = md.get().digest(
        v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
      val bucket = h(0) & 0xff
      // leading zero bits of bytes 1..15, then +1 (rho is 1-based)
      var z = 0
      var i = 1
      var run = true
      while (run && i < 16) {
        val b = h(i) & 0xff
        if (b == 0) { z += 8; i += 1 }
        else { z += Integer.numberOfLeadingZeros(b) - 24; run = false }
      }
      val rho = math.min(z + 1, RhoCap)
      if (rho > buffer(bucket)) buffer(bucket) = rho.toByte
    }
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) {
      if (other(i) > buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Byte]): Any =
    new GenericArrayData(buffer.map(_.toInt))

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllSketch =
    copy(child = newChild)
}

object HllSketch {
  /** Register count (p = 8). One byte of state per register. */
  val M = 256

  /** Rho cap — see class scaladoc: keeps `Σ 2^(RhoCap − r)` ≤ 2^55. */
  val RhoCap = 47

  /** Aggregate Column: the 256-register sketch of `value`'s distincts. */
  def apply(value: Column): Column =
    ColumnBridge.column(HllSketch(ColumnBridge.expression(value)).toAggregateExpression())
}
