package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native n-gram kernels for the text pipeline (r21 optimization round,
  * guide §"eliminate non-codegen expressions in the hot path"): the
  * gram constructions ran as nested higher-order builtins
  * (`transform`/`filter`/`sequence` evaluate their lambda per ELEMENT
  * with boxing — profiled at ~2 s of executor time per task on
  * kilobyte-scale shuffles in q107/q170/q180). Each kernel consumes the
  * SPARK-side `split(lower(text), ' ')` word array, so tokenization
  * semantics stay the builtin's; outputs are BIT-IDENTICAL to the
  * builtin forms they replace (parity-pinned in TextGramsSpec).
  */
object TextGramFold {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The q131/q170 bucket fold for ONE gram string:
    * `conv(substring(md5(g), 1, 4), 16, 10) % nBuckets` — the first four
    * hex nibbles are the digest's first two bytes.
    */
  def bucketOf(g: UTF8String, nBuckets: Int): Long = {
    val d = md5.get()
    d.reset()
    val h = d.digest(g.getBytes)
    (((h(0) & 0xff) << 8) | (h(1) & 0xff)).toLong % nBuckets
  }

  /** LangIdOps.gramsOf ∘ bucketOf, fused: for each word, the padded
    * form `_w_`'s char trigrams at positions 1..max(len-2, 1) (code
    * points, the builtin `substring`/`length` unit; a degenerate padded
    * word shorter than 3 yields its whole self — `substring` truncates),
    * each hashed to its md5 bucket. One array out per row.
    */
  def charTrigramBuckets(words: ArrayData, nBuckets: Int): ArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    val n = words.numElements()
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        val p = "_" + words.getUTF8String(i).toString + "_"
        val len = p.codePointCount(0, p.length)
        val grams = math.max(len - 2, 1)
        var g = 0
        var off = 0 // UTF-16 offset of code point g
        while (g < grams) {
          val end = // offset after up to 3 code points from `off`
            p.offsetByCodePoints(off, math.min(3, len - g))
          out += bucketOf(UTF8String.fromString(p.substring(off, end)), nBuckets)
          if (g + 1 < grams) off = p.offsetByCodePoints(off, 1)
          g += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** SearchOps.bigrams: consecutive (w1, w2) pairs — the builtin form's
    * `filter(transform(sequence(1, size(w)), i -> struct(w[i-1], get(w, i))),
    * p -> p.w2 IS NOT NULL)`: pairs (w[i-1], w[i]) for i = 1..n-1 (null
    * ELEMENTS never come out of split; a null w2 is the past-the-end
    * probe the filter drops).
    */
  def bigramPairs(words: ArrayData): ArrayData = {
    val n = words.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var i = 1
    while (i < n) {
      out(i - 1) = InternalRow(words.getUTF8String(i - 1), words.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** SearchOps.q107's transition structs: for i = 2..n (1-based fold
    * index), (w1 = w[i-3] or null when out of range, w2 = w[i-2],
    * w3 = w[i-1]) — the two-words-of-context stream whose first entry
    * carries a null w1 (the backoff head).
    */
  def transitions(words: ArrayData): ArrayData = {
    val n = words.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var i = 2
    while (i <= n) {
      val w1 = if (i - 3 >= 0) words.getUTF8String(i - 3) else null
      out(i - 2) = InternalRow(w1, words.getUTF8String(i - 2), words.getUTF8String(i - 1))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** DedupOps.shingles: DISTINCT word n-grams in first-occurrence order
    * (`array_distinct` semantics), space-joined; zero shingles below n
    * words.
    */
  def shingles(words: ArrayData, n: Int): ArrayData = {
    val len = words.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i + n <= len) {
      sb.setLength(0)
      var o = 0
      while (o < n) {
        // concat_ws skips nulls; split tokens are never null, but a
        // null element must not crash the fold
        val w = if (words.isNullAt(i + o)) null else words.getUTF8String(i + o)
        if (w != null) {
          if (sb.length() > 0) sb.append(' ')
          sb.append(w.toString)
        }
        o += 1
      }
      seen.add(UTF8String.fromString(sb.toString)); ()
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}

/** Base for the word-array kernels: array<string> in. */
sealed abstract class WordArrayKernel extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>, got $other")
  }
}

/** Fused padded-char-trigram md5 buckets (LangIdOps.gramsOf ∘ bucketOf). */
case class CharTrigramBuckets(child: Expression, nBuckets: Int) extends WordArrayKernel {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_trigram_buckets"
  override def nullSafeEval(input: Any): Any =
    TextGramFold.charTrigramBuckets(input.asInstanceOf[ArrayData], nBuckets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextGramFold.charTrigramBuckets($c, $nBuckets);")
  override protected def withNewChildInternal(newChild: Expression): CharTrigramBuckets =
    copy(child = newChild)
}

object CharTrigramBuckets {
  def apply(words: Column, nBuckets: Int): Column =
    ColumnBridge.column(CharTrigramBuckets(ColumnBridge.expression(words), nBuckets))
}

/** Consecutive word-pair structs (SearchOps.bigrams). */
case class WordBigramPairs(child: Expression) extends WordArrayKernel {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("w1", StringType), StructField("w2", StringType))),
    containsNull = false)
  override def prettyName: String = "word_bigram_pairs"
  override def nullSafeEval(input: Any): Any =
    TextGramFold.bigramPairs(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextGramFold.bigramPairs($c);")
  override protected def withNewChildInternal(newChild: Expression): WordBigramPairs =
    copy(child = newChild)
}

object WordBigramPairs {
  def apply(words: Column): Column =
    ColumnBridge.column(WordBigramPairs(ColumnBridge.expression(words)))
}

/** Two-words-of-context transition structs (q107's stream). */
case class WordTransitions(child: Expression) extends WordArrayKernel {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("w1", StringType), StructField("w2", StringType),
    StructField("w3", StringType))),
    containsNull = false)
  override def prettyName: String = "word_transitions"
  override def nullSafeEval(input: Any): Any =
    TextGramFold.transitions(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextGramFold.transitions($c);")
  override protected def withNewChildInternal(newChild: Expression): WordTransitions =
    copy(child = newChild)
}

object WordTransitions {
  def apply(words: Column): Column =
    ColumnBridge.column(WordTransitions(ColumnBridge.expression(words)))
}

/** Distinct word n-gram shingles, first-occurrence order (DedupOps.shingles). */
case class WordShingles(child: Expression, n: Int) extends WordArrayKernel {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"
  override def nullSafeEval(input: Any): Any =
    TextGramFold.shingles(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextGramFold.shingles($c, $n);")
  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  def apply(words: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(words), n))
}
