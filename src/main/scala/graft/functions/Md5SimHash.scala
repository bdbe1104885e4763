package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Shared fold for the PORTABLE 32-bit SimHash (q66): per-bit majority
  * vote over the shingles' md5 digests, bits taken from the digest's
  * leading 8 hex digits — `q66SimhashReplay`'s aggregate semantics
  * (32 conditional ±1 sums over `instr`/`substr`/`shiftright` hex
  * arithmetic) in ONE per-row pass over raw digest bytes. Bit `b` of the
  * oracle's algebra lives in hex digit `b/4` (digest byte `b/8`, high
  * nibble first), bit `b%4` within the digit — replicated here directly
  * on the byte, no hex string ever materialized. Returns the packed
  * fingerprint (vote > 0 → 1, tie → 0); the caller counts features
  * separately (`size` of the shingle array).
  */
object Md5SimHashFold {
  private val tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def fold(arr: ArrayData): Long = {
    val md = tl.get()
    val votes = new Array[Int](32)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      var b = 0
      while (b < 32) {
        // hex digit b/4: byte b/8, HIGH nibble for even digit index
        val byte = d(b / 8) & 0xFF
        val digit = if ((b / 4) % 2 == 0) byte >> 4 else byte & 0xF
        if (((digit >> (b % 4)) & 1) == 1) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) > 0) fp |= 1L << b
      b += 1
    }
    fp
  }
}

/** Native expression form: packed 32-bit SimHash (as LONG) of an
  * `array<string>` shingle column (parity-tested against the aggregate
  * hex-arithmetic form). An empty array votes nothing → fingerprint 0,
  * matching the aggregate form's absent group after the caller's
  * non-empty filter.
  */
case class Md5SimHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"md5_simhash requires array<string>, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_simhash"

  override def nullSafeEval(input: Any): Any =
    Md5SimHashFold.fold(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.Md5SimHashFold.fold($c);")

  override protected def withNewChildInternal(newChild: Expression): Md5SimHash =
    copy(child = newChild)
}

object Md5SimHash {
  def apply(shingles: Column): Column =
    ColumnBridge.column(Md5SimHash(ColumnBridge.expression(shingles)))
}
