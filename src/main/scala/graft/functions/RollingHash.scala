package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Full XXH64 (Y. Collet's public xxHash specification) over a byte slice,
  * seed 42 — bit-identical to Spark's `xxhash64` of the same bytes as a
  * string column (parity-tested).
  */
object XxHash64Bytes {
  private val Prime1 = 0x9E3779B185EBCA87L
  private val Prime2 = 0xC2B2AE3D27D4EB4FL
  private val Prime3 = 0x165667B19E3779F9L
  private val Prime4 = 0x85EBCA77C2B2AE63L
  private val Prime5 = 0x27D4EB2F165667C5L

  private def readLongLE(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) | ((b(i + 2) & 0xFFL) << 16) |
      ((b(i + 3) & 0xFFL) << 24) | ((b(i + 4) & 0xFFL) << 32) |
      ((b(i + 5) & 0xFFL) << 40) | ((b(i + 6) & 0xFFL) << 48) | ((b(i + 7) & 0xFFL) << 56)

  private def readIntLE(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) | ((b(i + 2) & 0xFFL) << 16) |
      ((b(i + 3) & 0xFFL) << 24)

  def hash(bytes: Array[Byte], offset: Int, length: Int, seed: Long): Long = {
    var idx = offset
    val end = offset + length
    var hash =
      if (length >= 32) {
        var v1 = seed + Prime1 + Prime2
        var v2 = seed + Prime2
        var v3 = seed
        var v4 = seed - Prime1
        while (idx <= end - 32) {
          v1 = java.lang.Long.rotateLeft(v1 + readLongLE(bytes, idx) * Prime2, 31) * Prime1
          v2 = java.lang.Long.rotateLeft(v2 + readLongLE(bytes, idx + 8) * Prime2, 31) * Prime1
          v3 = java.lang.Long.rotateLeft(v3 + readLongLE(bytes, idx + 16) * Prime2, 31) * Prime1
          v4 = java.lang.Long.rotateLeft(v4 + readLongLE(bytes, idx + 24) * Prime2, 31) * Prime1
          idx += 32
        }
        var h = java.lang.Long.rotateLeft(v1, 1) + java.lang.Long.rotateLeft(v2, 7) +
          java.lang.Long.rotateLeft(v3, 12) + java.lang.Long.rotateLeft(v4, 18)
        h ^= java.lang.Long.rotateLeft(v1 * Prime2, 31) * Prime1; h = h * Prime1 + Prime4
        h ^= java.lang.Long.rotateLeft(v2 * Prime2, 31) * Prime1; h = h * Prime1 + Prime4
        h ^= java.lang.Long.rotateLeft(v3 * Prime2, 31) * Prime1; h = h * Prime1 + Prime4
        h ^= java.lang.Long.rotateLeft(v4 * Prime2, 31) * Prime1; h = h * Prime1 + Prime4
        h
      } else seed + Prime5
    hash += length
    while (idx <= end - 8) {
      hash ^= java.lang.Long.rotateLeft(readLongLE(bytes, idx) * Prime2, 31) * Prime1
      hash = java.lang.Long.rotateLeft(hash, 27) * Prime1 + Prime4
      idx += 8
    }
    if (idx <= end - 4) {
      hash ^= readIntLE(bytes, idx) * Prime1
      hash = java.lang.Long.rotateLeft(hash, 23) * Prime2 + Prime3
      idx += 4
    }
    while (idx < end) {
      hash ^= (bytes(idx) & 0xFFL) * Prime5
      hash = java.lang.Long.rotateLeft(hash, 11) * Prime1
      idx += 1
    }
    hash ^= hash >>> 33
    hash *= Prime2
    hash ^= hash >>> 29
    hash *= Prime3
    hash ^= hash >>> 32
    hash
  }
}

/** Shared fold (mirror-class static for codegen): XXH64 of every k-byte
  * window of the string's UTF-8 bytes, seed 42. Byte-window semantics: for
  * ASCII text this equals `xxhash64(substr(text, i+1, k))` per window
  * (parity-tested on the corpus); multi-byte text hashes byte windows
  * rather than char windows — documented divergence, irrelevant to
  * fingerprint quality.
  */
object RollingHashFold {
  def fold(s: UTF8String, k: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val count = math.max(n - k, 0) + 1
    val out = new Array[Long](count)
    var i = 0
    while (i < count) {
      out(i) = XxHash64Bytes.hash(bytes, i, math.min(k, n - i), 42L)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native rolling k-gram hash expression over a string column — one
  * primitive pass over the UTF-8 bytes instead of an interpreted transform
  * allocating a substring per window.
  */
case class RollingHash(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "window must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"rolling_hash requires string, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any =
    RollingHashFold.fold(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.RollingHashFold.fold($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  def apply(text: Column, k: Int): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(text), k))
}
