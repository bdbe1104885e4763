package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE apply (q80–q82): the merges-table well-formedness the oracle's
  * CTE-replay equivalence rests on, and direct parity between the native
  * merge-all fold and an independent ONE-PAIR-AT-A-TIME reference (the
  * exact semantics the recursive CTE executes).
  */
class BpeTokensSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("merges table is well-formed: every side is a base char or an earlier result") {
    val produced = scala.collection.mutable.Set.empty[String]
    for (((l, r), i) <- BpeFold.Merges.zipWithIndex) {
      assert(l.length == 1 || produced(l), s"merge $i left side '$l' not yet produced")
      assert(r.length == 1 || produced(r), s"merge $i right side '$r' not yet produced")
      produced += l + r
    }
    // and results are unique (a duplicate product would make rank lookups
    // ambiguous in spirit even though the map keys are pairs)
    assert(BpeFold.Merges.map { case (l, r) => l + r }.distinct.size ==
      BpeFold.Merges.size)
  }

  /** One-pair-at-a-time reference: the recursive CTE's step function —
    * leftmost occurrence of the lowest-rank applicable merge, on the
    * space-wrapped token string.
    */
  private def encodeSequential(w: String): Seq[String] = {
    val chars = w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
    if (chars.isEmpty) return Seq.empty
    var s = chars.mkString(" ", " ", " ")
    var done = false
    while (!done) {
      val applicable = BpeFold.Merges.zipWithIndex
        .find { case ((l, r), _) => s.contains(s" $l $r ") }
      // find = lowest rank first (Merges is in rank order)
      applicable match {
        case None => done = true
        case Some(((l, r), _)) =>
          val pat = s" $l $r "
          val pos = s.indexOf(pat)
          s = s.substring(0, pos) + s" $l$r " + s.substring(pos + pat.length)
      }
    }
    s.trim.split(" ").toSeq
  }

  test("native merge-all fold == one-pair-at-a-time replay (the oracle equivalence)") {
    val hostile = Seq("aaaa", "ttthhh", "thethethe", "and", "wasp", "x",
      "ingesting", "overwithstanding", "qqq", "abcdefghijklmnopqrstuvwxyz")
    for (w <- hostile)
      assert(BpeFold.encodeWord(w).toSeq == encodeSequential(w), s"word '$w'")
    // and over real corpus words
    val words = graft.Tables.documents(spark, sf)
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0).distinct().limit(500)
      .collect().map(_.getString(0))
    assert(words.nonEmpty)
    for (w <- words; piece <- graft.operators.TextOps.BpeTokenPattern.r.findAllIn(w))
      assert(BpeFold.encodeWord(piece).toSeq == encodeSequential(piece),
        s"corpus piece '$piece'")
  }

  test("q80 shape: token stream reassembles the pre-token text; counts bounded") {
    val rows = graft.Tables.documents(spark, sf)
      .limit(50)
      .select(col("doc_id"), lower(col("text")).as("lt"),
        graft.operators.TextOps.bpeTokens(col("text")).as("toks"))
      .collect()
    for (r <- rows) {
      val lt = r.getString(1)
      val toks = r.getSeq[String](2)
      val pre = graft.operators.TextOps.BpeTokenPattern.r.findAllIn(lt).toSeq
      // merging never crosses pre-token boundaries: concatenating the
      // BPE tokens reproduces the concatenated pre-tokens exactly
      assert(toks.mkString == pre.mkString, s"doc ${r.getLong(0)}")
      // counts: at least one token per pre-token, at most one per char
      assert(toks.size >= pre.size && toks.size <= pre.map(_.length).sum)
    }
  }

  test("interpreted eval path agrees with the fold") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val pre = Seq("the", "1", "!", "withstanding")
    val expr = BpeTokens(Literal.create(
      ArrayData.toArrayData(pre.map(UTF8String.fromString).toArray),
      ArrayType(StringType)))
    val got = expr.eval(null).asInstanceOf[ArrayData]
    val want = pre.flatMap(w => BpeFold.encodeWord(w).toSeq)
    assert((0 until got.numElements()).map(i => got.getUTF8String(i).toString) == want)
  }

  test("q108 training learns the textbook merges on the low/lower/lowest corpus") {
    import spark.implicits._
    // the canonical BPE example: low x2, lower, lowest
    val docs = Seq((1L, "en", "low low lower lowest")).toDF("doc_id", "lang", "text")
    val got = graft.operators.TextOps.bpeTrain(spark, docs, steps = 4)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // round 1: (l,o) and (o,w) both count 4 -> tie-break takes l ASC
    // round 2: (lo,w)=4 — an earlier merge RESULT as a side (the
    //          iterative dependency that distinguishes training from
    //          counting); round 3: (low,e)=2; round 4: ties at 1 ->
    //          (lowe,r) by the lexicographic rule
    assert(got.toSeq == Seq(
      (1, "l", "o", 4L), (2, "lo", "w", 4L),
      (3, "low", "e", 2L), (4, "lowe", "r", 1L)), got.toSeq.toString)
  }
}
