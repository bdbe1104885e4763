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
    // plan shape pins the doc's claims: the scan reads only the two
    // needed columns (the histogram form dropped doc_id), and the window
    // cumulation runs over HISTOGRAM rows — every Sort/Window node must
    // sit above the histogram aggregate, never on the raw document stream
    // (the round-10 per-language full sort was the one declared
    // scale-killer)
    val plan = TextOps.q54LengthProfile(spark, sf)
      .queryExecution.executedPlan.toString
    val read = "ReadSchema: [^\\n]*".r.findFirstIn(plan).getOrElse("")
    for (c <- Seq("lang", "text"))
      assert(read.contains(c), s"scan schema missing $c: $read")
    // doc_id is tolerated since r21: the input-widening repartition
    // (Tables.widen, active only when the scan is narrower than the
    // cluster) keys on it; at scale the widen is a no-op and the scan
    // prunes back to (lang, text)
    for (c <- Seq("source"))
      assert(!read.contains(c), s"scan reads unneeded column $c: $read")
    val sortsAndWindows = graft.SparkTestSession
      .finalPlan(TextOps.q54LengthProfile(spark, sf)).collect {
        case s: org.apache.spark.sql.execution.SortExec => s
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
    assert(sortsAndWindows.nonEmpty)
    for (node <- sortsAndWindows) {
      val aggsBelow = node.collect {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a }
      assert(aggsBelow.nonEmpty,
        s"${node.nodeName} runs over the raw row stream (no aggregate below it):\n$node")
    }
  }

  test("boilerplate coverage: overlap positions, per-doc-distinct df, relative threshold") {
    import spark.implicits._
    // 10 template copies (their 3 shingles reach df 10-11 of 13 docs),
    // one partially-templated doc, one doc whose own shingle repeats
    // 3x INSIDE it (df must still be 1 — document frequency), one
    // too-short doc. minDfBp 5000 => frequent iff df >= ceil(13*0.5) = 7.
    val docs = ((0 until 10).map(i => (i.toLong, "a b c d e")) ++ Seq(
      (100L, "p q r a b c s t u"),
      (200L, "m n o m n o m n o"),
      (300L, "xy"))).toDF("doc_id", "text")
    val got = TextOps.boilerplateCoverage(docs, minDfBp = 5000L, flagBp = 3000L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))))
      .toMap
    // template docs: starts 0,1,2 cover positions 0..4 DISTINCT => 5 of 5,
    // not 9 (overlaps collapse)
    for (i <- 0 until 10)
      assert(got(i.toLong) == ((5L, 5L, 10000L, 1)), s"doc $i: ${got(i.toLong)}")
    // partial: only "a b c" (df 11) is frequent; at start 3 it covers
    // positions 3,4,5 => 3 of 9 => 3333 bp, flagged at the 3000 bp bar
    assert(got(100L) == ((9L, 3L, 3333L, 1)), got(100L).toString)
    // in-doc repetition does not manufacture document frequency
    assert(got(200L) == ((9L, 0L, 0L, 0)), got(200L).toString)
    // < 3 tokens: no shingles, zero coverage, no division blowup
    assert(got(300L) == ((1L, 0L, 0L, 0)), got(300L).toString)
  }

  test("vocab coverage: learned top-V, occurrence-counted OOV, no window in the plan") {
    import spark.implicits._
    // occurrence counts: a=7, b=6, c=3 => V=2 learns {a, b}
    val docs = Seq(
      (1L, "a a a b"),   // 0 OOV of 4
      (2L, "a b c c"),   // 2 OOV of 4 => 5000 bp
      (3L, "c b b a"),   // 1 OOV of 4 => 2500 bp
      (4L, "b a b a")).toDF("doc_id", "text")
    val got = TextOps.vocabCoverage(docs, 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((4L, 0L, 0L)))
    assert(got(2L) == ((4L, 2L, 5000L)))
    assert(got(3L) == ((4L, 1L, 2500L)))
    assert(got(4L) == ((4L, 0L, 0L)))
    val plan = TextOps.q64VocabCoverage(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q61 plan: frequent-set join broadcasts, no window, pruned scan") {
    val plan = TextOps.q61BoilerplateCoverage(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    val read = "ReadSchema: [^\\n]*".r.findFirstIn(plan).getOrElse("")
    assert(read.contains("doc_id") && read.contains("text"), read)
    assert(!read.contains("lang") && !read.contains("source"),
      s"scan reads unneeded columns: $read")
  }
}
