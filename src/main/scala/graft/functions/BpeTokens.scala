package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding APPLY (Sennrich et al. 2016; the GPT-2 encoder's
  * merge loop): each pre-token is split into characters, then the
  * lowest-rank applicable merge from a FIXED, well-formed merges table is
  * applied (all left-to-right non-overlapping occurrences) until no pair
  * in the table remains. "Well-formed" = every merge's two sides are
  * single characters or the results of strictly earlier merges — which
  * makes one-pair-at-a-time application (what a SQL recursive CTE can
  * replay) provably equivalent to the merge-all-occurrences loop here:
  * a merge can only create pairs of LATER rank than the one it applied,
  * so the next chosen pair is the same either way. The oracle relies on
  * that equivalence (`BpeWellFormedSpec` asserts the table property).
  *
  * The merges table is a static engine constant (the tiktoken/GPT-2
  * deployment shape: the vocab ships with the engine, not the query), so
  * the token stream is a pure deterministic function of the text — the
  * SQL oracle replays it merge-for-merge from the same table.
  *
  * Scale shape: one per-row fold, no shuffle, no state. A per-JVM
  * bounded memo caches word → tokens (natural-language corpora repeat
  * words heavily; the GPT-2 encoder keeps the same cache).
  */
object BpeFold {

  /** The fixed merges table, in rank order. Sides are lowercase letters
    * or earlier merge results ONLY — `BpeTokensSpec` asserts
    * well-formedness so the CTE-replay equivalence holds.
    */
  val Merges: Vector[(String, String)] = Vector(
    ("t", "h"), ("i", "n"), ("a", "n"), ("r", "e"), ("o", "n"),
    ("e", "r"), ("n", "d"), ("a", "t"), ("o", "r"), ("e", "n"),
    ("e", "s"), ("o", "u"), ("t", "o"), ("i", "t"), ("i", "s"),
    ("a", "l"), ("a", "r"), ("s", "t"), ("l", "e"), ("th", "e"),
    ("an", "d"), ("in", "g"), ("e", "d"), ("c", "o"), ("s", "e"),
    ("l", "l"), ("m", "e"), ("d", "e"), ("h", "i"), ("r", "i"),
    ("h", "e"), ("w", "h"), ("f", "o"), ("u", "n"), ("l", "o"),
    ("m", "a"), ("p", "r"), ("t", "er"), ("at", "i"), ("en", "t"),
    ("w", "it"), ("th", "at"), ("f", "or"), ("b", "e"), ("a", "s"),
    ("w", "as"), ("n", "o"), ("w", "e"))

  private val ranks: Map[(String, String), Int] =
    Merges.zipWithIndex.toMap

  // bounded word → tokens memo (cleared wholesale at the cap; corpus
  // vocabularies are far smaller, so eviction is a safety valve, not a
  // working regime)
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
  private val MemoCap = 1 << 17

  def encodeWord(w: String): Array[String] = {
    val hit = memo.get(w)
    if (hit != null) return hit
    // split by CODE POINTS (SQL `substr` character semantics) — a
    // UTF-16-unit split would break surrogate pairs and diverge from the
    // oracle's per-character replay
    var toks = w.codePoints().toArray
      .map(cp => new String(Character.toChars(cp)))
    var done = false
    while (!done && toks.length > 1) {
      // lowest-rank adjacent pair present in the table
      var best = Int.MaxValue
      var i = 0
      while (i < toks.length - 1) {
        ranks.get((toks(i), toks(i + 1))) match {
          case Some(r) if r < best => best = r
          case _ =>
        }
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (l, r) = Merges(best)
        val out = new scala.collection.mutable.ArrayBuffer[String](toks.length)
        var j = 0
        while (j < toks.length) {
          if (j < toks.length - 1 && toks(j) == l && toks(j + 1) == r) {
            out += l + r; j += 2 // left-to-right, non-overlapping
          } else { out += toks(j); j += 1 }
        }
        toks = out.toArray
      }
    }
    if (memo.size >= MemoCap) memo.clear()
    memo.put(w, toks)
    toks
  }

  def fold(preTokens: ArrayData): ArrayData = {
    val n = preTokens.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](n * 2)
    var i = 0
    while (i < n) {
      val w = preTokens.getUTF8String(i)
      if (w != null) {
        val toks = encodeWord(w.toString)
        var j = 0
        while (j < toks.length) { out += UTF8String.fromString(toks(j)); j += 1 }
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }
}

/** Native expression form: BPE token stream (array<string>) of an
  * `array<string>` pre-token column. One codegen call per row — applying
  * the merge loop inside a `transform` lambda would evaluate interpreted
  * per element (the boxing hazard the other folds avoid).
  */
case class BpeTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"bpe_tokens requires array<string>, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_tokens"

  override def nullSafeEval(input: Any): Any =
    BpeFold.fold(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.BpeFold.fold($c);")

  override protected def withNewChildInternal(newChild: Expression): BpeTokens =
    copy(child = newChild)
}

object BpeTokens {
  def apply(preTokens: Column): Column =
    ColumnBridge.column(BpeTokens(ColumnBridge.expression(preTokens)))
}
