package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Language identification: the hashed-NB trigram classifier must
  * separate same-script languages, generalize to held-out documents,
  * stay deterministic, and keep its model fixed-size.
  */
class LangIdOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("model is bounded: 6 langs x seen buckets, every lang present per bucket") {
    val corpus = LangIdOps.syntheticLangText(
      graft.Tables.documents(spark, "/root/testdata/sf0.001").limit(60))
    val model = LangIdOps.trainModel(corpus)
    val byBucket = model.groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .select(col("n")).distinct().collect().map(_.getLong(0)).toSeq
    assert(byBucket == Seq(6L), s"every bucket must carry all 6 langs: $byBucket")
    assert(model.count() <= 6L * LangIdOps.NBuckets)
  }

  test("q170 on sf0.001: 100% agreement incl. the held-out quarter; " +
    "same-script languages separated") {
    val rows = LangIdOps.q170LangId(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    var heldOut = 0
    val latin = Set("de", "en", "es", "fr")
    var latinDocs = 0
    rows.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"doc ${r.getLong(0)}: true ${r.getString(1)} pred ${r.getString(2)}")
      if (!r.getBoolean(3)) heldOut += 1
      if (latin(r.getString(1))) latinDocs += 1
    }
    assert(heldOut > 0, "the held-out split must be represented")
    assert(latinDocs > 0)
  }

  test("a mixed-language probe lands on the majority language") {
    import spark.implicits._
    val corpus = LangIdOps.syntheticLangText(
      graft.Tables.documents(spark, "/root/testdata/sf0.001"))
    val model = LangIdOps.trainModel(corpus)
    // 20 French words + 5 English words
    val fr = LangIdOps.Langs.toMap.apply("fr").take(20)
    val en = LangIdOps.Langs.toMap.apply("en").take(5)
    val probe = Seq((999999L, (fr ++ en).mkString(" ")))
      .toDF("doc_id", "text")
    val pred = LangIdOps.predict(probe, model).collect()
    assert(pred.head.getString(1) == "fr", pred.head.getString(1))
  }
}
