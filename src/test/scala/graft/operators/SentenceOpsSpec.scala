package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sentence segmentation: every rule on a hand corpus — terminator +
  * capital splits, abbreviations and decimals held together, sentinel
  * restoration, empties dropped.
  */
class SentenceOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def split(text: String): Seq[String] = {
    import spark.implicits._
    Seq((1L, text)).toDF("doc_id", "t")
      .select(SentenceOps.sentences(col("t")).as("s"))
      .collect().head.getSeq[String](0).toSeq
  }

  test("terminators before capitals split; abbreviations and decimals hold") {
    assert(split("One here. Two there! Three? Four.") ==
      Seq("One here.", "Two there!", "Three?", "Four."))
    assert(split("Dr. Smith met Prof. Jones.") == Seq("Dr. Smith met Prof. Jones."))
    assert(split("It is 3.14 km. Next one.") == Seq("It is 3.14 km.", "Next one."))
    assert(split("See e.g. the spec. Also i.e. this.") ==
      Seq("See e.g. the spec.", "Also i.e. this."))
  }

  test("lowercase continuations and mid-word dots never split") {
    assert(split("a.b.c stays. and lower. Next starts.") ==
      Seq("a.b.c stays. and lower.", "Next starts."))
  }

  test("q167 on sf0.001: planted rules bind, counts and sha deterministic") {
    val rows = SentenceOps.q167SentenceSplit(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    // the planted block alone contributes 4 sentence breaks, so every
    // row has at least 4 sentences
    assert(rows.forall(_.getAs[Long]("n_sentences") >= 4L))
    assert(rows.forall(_.getAs[Long]("avg_len") > 0L))
    val again = SentenceOps.q167SentenceSplit(spark, "/root/testdata/sf0.001")
      .collect()
    assert(again.map(_.toString).toSeq == rows.map(_.toString).toSeq)
  }
}
