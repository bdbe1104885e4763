package graft.functions

import graft.SparkTestSession
import graft.operators.{ClassifyOps, DedupOps, LangIdOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parity of the r21 native text-gram kernels against the builtin
  * higher-order forms they replaced, on real corpus text (including the
  * Cyrillic/Greek/Turkish lang tables — multi-byte code points exercise
  * the substring/length semantics) and crafted edge rows. The contract
  * is BIT-IDENTICAL output, so every downstream oracle hash
  * (q20-family shingles, q92/q107/q116 n-gram LMs, q170/q180 langid)
  * is provably unchanged.
  */
class TextGramsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def edgeDf = {
    import spark.implicits._
    Seq(
      "",                       // one empty token after split
      "one",
      "one two",
      "a  b",                   // double space → empty middle token
      "straße çok ĉiam γλώσσα время", // multi-byte code points
      "x y x y x y"             // duplicate shingles → distinct order
    ).toDF("text")
  }

  private def corpusDf =
    graft.Tables.documents(spark, sf).select(col("text"))
      .unionByName(LangIdOps.syntheticTextOf(
        graft.Tables.documents(spark, sf),
        LangIdOps.Langs12 ++ LangIdOps.LangsForeign).select(col("text")))
      .unionByName(edgeDf)

  test("WordShingles == builtin shingles, corpus + edges, order included") {
    val native = corpusDf.select(DedupOps.shingles(col("text"), 3).as("s"))
      .collect().map(_.getSeq[String](0))
    val builtin = corpusDf.select(DedupOps.shinglesBuiltins(col("text"), 3).as("s"))
      .collect().map(_.getSeq[String](0))
    assert(native.length == builtin.length)
    native.zip(builtin).zipWithIndex.foreach { case ((n, b), i) =>
      assert(n == b, s"row $i: $n != $b")
    }
  }

  test("CharTrigramBuckets == explode(gramsOf) -> bucketOf, multiset per row") {
    val native = corpusDf
      .select(CharTrigramBuckets(split(lower(col("text")), " "),
        LangIdOps.NBuckets).as("b"))
      .collect().map(_.getSeq[Long](0).sorted)
    val builtin = corpusDf
      .select(transform(LangIdOps.gramsOf("text"),
        g => ClassifyOps.bucketOf(g, LangIdOps.NBuckets)).as("b"))
      .collect().map(_.getSeq[Long](0).sorted)
    assert(native.length == builtin.length)
    native.zip(builtin).zipWithIndex.foreach { case ((n, b), i) =>
      assert(n == b, s"row $i buckets differ")
    }
  }

  test("WordBigramPairs == builtin consecutive-pair fold") {
    val w = split(lower(col("text")), " ")
    val native = corpusDf.select(WordBigramPairs(w).as("p"))
      .selectExpr("transform(p, x -> concat(x.w1, '|', x.w2)) AS p")
      .collect().map(_.getSeq[String](0))
    val builtin = corpusDf.select(w.as("w"))
      .selectExpr("filter(transform(sequence(1, size(w)), i -> " +
        "struct(w[i-1] AS w1, get(w, i) AS w2)), p -> p.w2 IS NOT NULL) AS p")
      .selectExpr("transform(p, x -> concat(x.w1, '|', x.w2)) AS p")
      .collect().map(_.getSeq[String](0))
    assert(native.toSeq == builtin.toSeq)
  }

  test("WordTransitions == builtin two-context fold (null w1 head included)") {
    val w = split(lower(col("text")), " ")
    val render = "transform(p, x -> concat(coalesce(x.w1, '<null>'), '|', x.w2, '|', x.w3)) AS p"
    val native = corpusDf.select(WordTransitions(w).as("p"))
      .selectExpr(render).collect().map(_.getSeq[String](0))
    val builtin = corpusDf.select(w.as("w"))
      .selectExpr("filter(transform(sequence(1, size(w)), i -> " +
        "struct(get(w, i - 3) AS w1, get(w, i - 2) AS w2, w[i - 1] AS w3)), " +
        "p -> p.w2 IS NOT NULL) AS p")
      .selectExpr(render).collect().map(_.getSeq[String](0))
    assert(native.toSeq == builtin.toSeq)
  }
}
