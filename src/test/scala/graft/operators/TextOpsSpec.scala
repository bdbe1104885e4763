package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("langId picks the language with most marker hits, und on none") {
    import spark.implicits._
    val df = Seq(
      ("the cat and the dog is of interest to me", "en"),
      ("el gato y la casa de los perros es bonita", "es"),
      ("der hund und die katze ist mit uns", "de"),
      ("le chat et la maison des gens est grande", "fr"),
      ("zzz qqq xyzzy plugh", "und")).toDF("text", "expected")
    val got = df.withColumn("guess", TextOps.langId(col("text")))
      .filter(col("guess") =!= col("expected")).collect()
    assert(got.isEmpty, got.mkString(", "))
  }

  test("winnowing fingerprints are deterministic and position-robust") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val shifted = "PREFIX " + base // local windows inside `base` are preserved
    val df = Seq(base, shifted).toDF("text")
      .select(TextOps.winnowFingerprint("text").as("fp"))
    val Array(fp1, fp2) = df.collect().map(_.getSeq[Long](0).toSet)
    // identical computation twice is identical
    val again = Seq(base).toDF("text")
      .select(TextOps.winnowFingerprint("text").as("fp"))
      .collect().head.getSeq[Long](0).toSet
    assert(fp1 == again)
    // most of the base fingerprint survives the prefix shift
    val overlap = (fp1 intersect fp2).size.toDouble / fp1.size
    assert(overlap > 0.7, s"overlap=$overlap")
  }

  test("q19 stats are internally consistent on sf0.001") {
    val df = TextOps.q19TextStats(spark, "/root/testdata/sf0.001")
    val bad = df.filter(
      col("n_distinct_tokens") > col("n_tokens") ||
        col("stopword_ratio") < 0 || col("stopword_ratio") > 1 ||
        col("punct_ratio") < 0 || col("punct_ratio") > 1 ||
        col("avg_token_len") <= 0)
    assert(bad.isEmpty, bad.limit(5).collect().mkString("\n"))
    assert(df.count() == 500)
  }
}
