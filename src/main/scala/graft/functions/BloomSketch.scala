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

/** Bloom filter aggregate (Bloom 1970) with the family's PORTABLE md5
  * hashing: 2048 bits, 4 probes per value — probe i of v sets bit
  * `int(first 4 hex digits of md5("i:" || v)) mod 2048`.
  *
  * The membership complement of [[HllSketch]] (cardinality) and
  * [[CmsSketch]] (frequency): after one pass, "was v in the stream?"
  * answers from 256 bytes of state with NO false negatives and a bounded
  * false-positive rate (~(bits_set/2048)^4). Merge is bitwise OR, so
  * per-partition/per-day filters union losslessly — and unlike Spark's
  * `bloom_filter_agg`/`might_contain` (private hash, opaque blob), the
  * filter words replay in the DuckDB oracle and the serialized form is an
  * interchange format any engine can probe.
  *
  * The filter is emitted as 128 SIXTEEN-bit words (ints): 16-bit packing
  * keeps every word's `1 << b` and the oracle's integer sums far from
  * int64 sign overflow (a 64-bit packing would need `1::BIGINT << 63`,
  * which wraps negative — engine-dependent territory the portable
  * discipline avoids).
  */
case class BloomSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]]
  with UnaryLike[Expression] {

  import BloomSketch.{Bits, Probes, WordBits, Words}

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_sketch requires string input, got $other")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_sketch"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](Words)

  override def update(buffer: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
      var i = 0
      while (i < Probes) {
        val p = BloomSketch.bitPos(i, bytes)
        buffer(p / WordBits) |= 1 << (p % WordBits)
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Int], other: Array[Int]): Array[Int] = {
    var i = 0
    while (i < Words) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Int]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(Words * 4)
    buffer.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(Words)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomSketch =
    copy(child = newChild)
}

object BloomSketch {
  /** Filter size in bits. */
  val Bits = 2048

  /** Probes (hash functions) per value. */
  val Probes = 4

  /** Bits per emitted word — 16, see class scaladoc. */
  val WordBits = 16

  /** Emitted word count: 2048 / 16. */
  val Words: Int = Bits / WordBits

  /** Probe i's bit position for a value: the first two md5 bytes (= four
    * hex digits) of `md5("i:" || v)`, mod `Bits`. */
  def bitPos(i: Int, valueUtf8: Array[Byte]): Int = {
    val md = tl.get()
    md.reset()
    md.update(s"$i:".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    md.update(valueUtf8)
    val h = md.digest()
    (((h(0) & 0xff) << 8) | (h(1) & 0xff)) % Bits
  }

  private val tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Aggregate Column: the 128-word (16-bit) filter of `value`s. */
  def apply(value: Column): Column =
    ColumnBridge.column(BloomSketch(ColumnBridge.expression(value)).toAggregateExpression())
}
