package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared fold for the PORTABLE winnowing fingerprint (q67): per-position
  * md5 hex digests of the k-char grams, then sorted-distinct sliding-window
  * minima — `TextOps.md5WinnowFingerprintBuiltins`' semantics in one
  * primitive pass. The builtin HOF form evaluates a whole expression
  * subtree (substring → cast → md5 → hex) interpreted PER ELEMENT; this
  * reuses one `MessageDigest` per thread and a monotonic deque for the
  * window minima (O(positions), not O(positions·w) slices). Measured ~5×
  * on the q67 bench path. Gram extraction walks a precomputed table of
  * UTF-8 code-point byte offsets and hashes the byte slice directly —
  * replicating SQL `substr` semantics (code points, not UTF-16 units)
  * without calling `UTF8String.substringSQL` per position (the
  * builtin-parity test would catch a divergence).
  */
object Md5WinnowFold {
  private val tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val Hex = "0123456789abcdef".toCharArray

  def fold(text: UTF8String, k: Int, w: Int): ArrayData = {
    // one bytes copy per ROW, then grams hash straight out of it via
    // precomputed code-point byte offsets — char semantics identical to
    // SQL substr (code points, not UTF-16 units or raw bytes), with zero
    // per-gram substring/getBytes allocation
    val bytes = text.getBytes
    val n = text.numChars()
    val offsets = new Array[Int](n + 1)
    var bi = 0
    var ci = 0
    while (bi < bytes.length) {
      if ((bytes(bi) & 0xC0) != 0x80) { offsets(ci) = bi; ci += 1 }
      bi += 1
    }
    offsets(n) = bytes.length
    val np = math.max(n - k, 0) + 1
    val md = tl.get()
    val digests = new Array[String](np)
    var p = 0
    while (p < np) {
      md.reset()
      val end = offsets(math.min(p + k, n))
      md.update(bytes, offsets(p), end - offsets(p))
      val d = md.digest()
      val hex = new Array[Char](32)
      var i = 0
      while (i < 16) {
        hex(2 * i) = Hex((d(i) >> 4) & 0xF)
        hex(2 * i + 1) = Hex(d(i) & 0xF)
        i += 1
      }
      digests(p) = new String(hex)
      p += 1
    }
    val winCount = math.max(np - w, 0) + 1
    val sel = new Array[String](winCount)
    val deque = new Array[Int](np)
    var head = 0
    var tail = 0
    var i = 0
    while (i < np) {
      val v = digests(i)
      while (tail > head && digests(deque(tail - 1)).compareTo(v) >= 0) tail -= 1
      deque(tail) = i
      tail += 1
      while (deque(head) < i - w + 1) head += 1
      if (i >= w - 1) sel(i - w + 1) = digests(deque(head))
      i += 1
    }
    if (np < w) sel(0) = digests(deque(head)) // single short window
    java.util.Arrays.sort(sel.asInstanceOf[Array[AnyRef]])
    var out = 0
    var j = 0
    while (j < winCount) {
      if (out == 0 || sel(j) != sel(out - 1)) { sel(out) = sel(j); out += 1 }
      j += 1
    }
    val res = new Array[AnyRef](out)
    var m = 0
    while (m < out) { res(m) = UTF8String.fromString(sel(m)); m += 1 }
    new GenericArrayData(res)
  }
}

/** Native expression form: `array<string>` of sorted distinct window-min
  * md5 digests of a string column's k-grams (parity-tested against the
  * builtin HOF composition).
  */
case class Md5Winnow(child: Expression, k: Int, w: Int) extends UnaryExpression {
  require(k >= 1 && w >= 1, "gram and window sizes must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"md5_winnow requires string, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "md5_winnow"

  override def nullSafeEval(input: Any): Any =
    Md5WinnowFold.fold(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.Md5WinnowFold.fold($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Md5Winnow =
    copy(child = newChild)
}

object Md5Winnow {
  def apply(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(Md5Winnow(ColumnBridge.expression(text), k, w))
}
