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

  test("q54 length profile matches a driver-side sort's index-rule percentiles") {
    val sf = "/root/testdata/sf0.001"
    val profile = TextOps.q54LengthProfile(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    // independent reference: collect (lang, doc_id, n_tokens), sort, index
    val rows = graft.Tables.documents(spark, sf)
      .select(col("lang"), col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    for ((lang, docs) <- rows.groupBy(_._1)) {
      val sorted = docs.sortBy(d => (d._3, d._2)).map(_._3)
      val n = sorted.length
      def pct(k: Int) = sorted(((n - 1).toLong * k / 100).toInt)
      val got = profile(lang)
      assert(got.getAs[Long]("n_docs") == n)
      assert(got.getAs[Long]("min_tokens") == sorted.min)
      assert(got.getAs[Long]("max_tokens") == sorted.max)
      assert(got.getAs[Long]("total_tokens") == sorted.sum)
      for ((k, fld) <- Seq(50 -> "p50_tokens", 90 -> "p90_tokens", 99 -> "p99_tokens"))
        assert(got.getAs[Long](fld) == pct(k),
          s"$lang $fld: got ${got.getAs[Long](fld)}, want ${pct(k)}")
    }
    // plan shape pins the doc's claims: the scan reads only the three
    // needed columns, and every hash exchange partitions on lang (the
    // window rank + the aggregate) — no corpus-wide exchange on any
    // other key ever appears
    val plan = TextOps.q54LengthProfile(spark, sf)
      .queryExecution.executedPlan.toString
    val read = "ReadSchema: [^\\n]*".r.findFirstIn(plan).getOrElse("")
    for (c <- Seq("lang", "doc_id", "text"))
      assert(read.contains(c), s"scan schema missing $c: $read")
    assert(!read.contains("source"), s"scan reads unneeded columns: $read")
    val hashParts = "hashpartitioning\\(([a-zA-Z_0-9#]+)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(hashParts.nonEmpty && hashParts.forall(_.startsWith("lang")),
      s"unexpected non-lang hash exchange: $hashParts")
  }
}
