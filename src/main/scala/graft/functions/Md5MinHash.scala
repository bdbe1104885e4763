package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared fold for the PORTABLE MinHash signature (q65): for each of `k`
  * permutations, the lexicographic-min `md5(i || ':' || shingle)` hex
  * digest over a row's shingle array — the aggregate form's semantics
  * (`min(md5(concat('i:', s)))` per permutation) in ONE per-row pass.
  * Digest order is compared on the raw 16 bytes (unsigned lexicographic ==
  * hex-string order, hex encoding is monotone per byte); mins hex-encode
  * once at the end. One thread-local MessageDigest, prefix bytes cached —
  * and the operator shape improves: the explode → k-column partial-min
  * shuffle becomes a pure projection, no exchange at all.
  */
object Md5MinHashFold {
  private val tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val Hex = "0123456789abcdef".toCharArray
  private val Prefixes: Array[Array[Byte]] =
    Array.tabulate(64)(i => s"$i:".getBytes("UTF-8"))

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xFF
      val y = b(i) & 0xFF
      if (x != y) return x < y
      i += 1
    }
    false
  }

  def fold(arr: ArrayData, k: Int): ArrayData = {
    val md = tl.get()
    val mins = new Array[Array[Byte]](k)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val sBytes = arr.getUTF8String(i).getBytes
      var p = 0
      while (p < k) {
        md.reset()
        md.update(if (p < Prefixes.length) Prefixes(p) else s"$p:".getBytes("UTF-8"))
        md.update(sBytes)
        val d = md.digest()
        if (mins(p) == null || unsignedLess(d, mins(p))) mins(p) = d
        p += 1
      }
      i += 1
    }
    val out = new Array[AnyRef](k)
    var p = 0
    while (p < k) {
      val d = mins(p)
      if (d == null) return null // no shingles: caller filters these rows out
      val hex = new Array[Char](32)
      var j = 0
      while (j < 16) {
        hex(2 * j) = Hex((d(j) >> 4) & 0xF)
        hex(2 * j + 1) = Hex(d(j) & 0xF)
        j += 1
      }
      out(p) = UTF8String.fromString(new String(hex))
      p += 1
    }
    new GenericArrayData(out)
  }
}

/** Native expression form: `array<string>` of the k per-permutation min
  * digests (null for an empty shingle array — mirrors the aggregate form,
  * where such docs produce no group).
  */
case class Md5MinHash(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "k must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"md5_minhash requires array<string>, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "md5_minhash"

  override def nullSafeEval(input: Any): Any =
    Md5MinHashFold.fold(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.Md5MinHashFold.fold($c, $k);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Md5MinHash =
    copy(child = newChild)
}

object Md5MinHash {
  def apply(shingles: Column, k: Int): Column =
    ColumnBridge.column(Md5MinHash(ColumnBridge.expression(shingles), k))
}
