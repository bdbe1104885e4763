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

  test("q180 on sf0.001: twelve trained languages exact, planted " +
    "out-of-model docs land und, both sides of the margin gap held") {
    import spark.implicits._
    val rows = LangIdOps.q180LangIdUnd(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"doc ${r.getLong(0)}: true ${r.getString(1)} pred ${r.getString(2)}")
    }
    assert(rows.count(_.getString(1) == "und") > 0, "foreign docs present")
    assert(rows.map(_.getString(1)).distinct.length == 13, "12 langs + und")
    // both sides of the abstention gap: every in-model margin clears
    // tau with headroom, every out-of-model margin sits far under it
    val all = LangIdOps.Langs12 ++ LangIdOps.LangsForeign
    val trained = LangIdOps.Langs12.map(_._1).toSet
    val corpus = LangIdOps.syntheticTextOf(
      graft.Tables.documents(spark, "/root/testdata/sf0.001"), all)
    val model = LangIdOps.trainModel(
      corpus.filter(col("true_lang").isInCollection(trained) &&
        col("doc_id") % 4 =!= 1), LangIdOps.Langs12.map(_._1))
    val m = corpus
      .join(LangIdOps.predictAbstain(corpus, model, -1.0), Seq("doc_id"))
      .select(col("true_lang").isInCollection(trained).as("inm"), col("margin"))
      .groupBy(col("inm")).agg(min("margin").as("mn"), max("margin").as("mx"))
      .as[(Boolean, Double, Double)].collect()
      .map { case (k, mn, mx) => k -> ((mn, mx)) }.toMap
    assert(m(true)._1 > 1.5, s"in-model min margin ${m(true)._1}")
    assert(m(false)._2 < 0.5, s"out-of-model max margin ${m(false)._2}")
  }

  test("predictAbstain covers every doc: an unscorable doc surfaces " +
    "as a typed und verdict, never a silent loss") {
    import spark.implicits._
    val corpus = LangIdOps.syntheticLangText(
      graft.Tables.documents(spark, "/root/testdata/sf0.001"))
    val model = LangIdOps.trainModel(corpus.filter(col("doc_id") % 4 =!= 1))
    // one real doc + one doc of pure digits (its trigrams either miss
    // every trained bucket — no verdict rows — or land a sub-threshold
    // margin through stray collisions; both paths must surface 'und')
    val probe = Seq((1L, "the and through language english very"),
      (2L, "0123456789 9876543210 1029384756")).toDF("doc_id", "text")
    val out = LangIdOps.predictAbstain(probe, model, 1.0)
      .select("doc_id", "pred_lang").as[(Long, String)].collect().sortBy(_._1)
    assert(out.length == 2, "every input doc must get a verdict row")
    assert(out(0) == (1L, "en"))
    assert(out(1)._2 == "und")
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
