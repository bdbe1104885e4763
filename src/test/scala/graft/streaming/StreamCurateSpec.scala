package graft.streaming

import graft.{SparkTestSession, Tables}
import graft.operators.DedupOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The composed streaming ingest: curated output of a 3-micro-batch run
  * equals the greedy-online batch replica — quality survivors, minus
  * decontamination hits, minus every document with an EARLIER-ARRIVED
  * near-dup (arrival order == id order here, so "earlier" == lower id ==
  * `minhashNearDup`'s doc_b side). Every filtered row is auditable in its
  * stage's sink.
  */
class StreamCurateSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("streaming curation (3 micro-batches) == greedy batch replica; drops auditable") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_scurate_").toString
    val all = Tables.documents(spark, sf)
    // one malformed null-text row rides along: the quality predicates
    // evaluate to SQL NULL on it, and the partition contract demands it
    // surface in the rejects sink (reason-tagged), not vanish
    val nullId = all.agg(max(col("doc_id"))).as[Long].head() + 1
    val nullRow = Seq((nullId, Option.empty[String], "en", "synthetic", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val train = all.filter(col("doc_id") % 20 =!= 0).unionByName(nullRow)
    val eval = all.filter(col("doc_id") % 20 === 0)
    val n = train.count()
    val ranked = train.withColumn("rnk", row_number().over(Window.orderBy(col("doc_id"))))
    for ((lo, hi, i) <- Seq(
        (1L, n / 3, 0), (n / 3 + 1, 2 * n / 3, 1), (2 * n / 3 + 1, n, 2)))
      ranked.filter(col("rnk").between(lo, hi)).drop("rnk")
        .coalesce(1).write.parquet(s"$base/feed/chunk=$i")

    val q = StreamCurate.run(spark, s"$base/feed/chunk=*", s"$base/ckpt",
      s"$base/curated", s"$base/flags", s"$base/decontam", s"$base/rejects",
      s"$base/index", eval)
    q.awaitTermination(180000L)
    assert(!q.isActive, "stream did not drain with AvailableNow")

    // batch replica of the online semantics
    val tokens = split(col("text"), " ")
    val quality = train
      .withColumn("n_tokens", size(tokens))
      .withColumn("n_distinct", size(array_distinct(tokens)))
      .filter(col("n_tokens") >= 10 &&
        col("n_distinct") * 100 >= col("n_tokens") * 30)
    val clean = quality.join(
      DedupOps.decontaminate(quality, eval).filter(col("keep")).select("doc_id"),
      Seq("doc_id"))
    val pairs = DedupOps.minhashNearDup(clean)
    assert(pairs.count() > 0, "no near-dup pairs among clean docs; parity vacuous")
    val droppedByDup = pairs.select("doc_b").as[Long].collect().toSet
    val expect = clean.select("doc_id").as[Long].collect().toSet -- droppedByDup

    val curated = spark.read.parquet(s"$base/curated")
    val got = curated.select("doc_id").as[Long].collect().toSet
    assert(got == expect,
      s"curated set diverged: stream-only=${(got -- expect).take(5)} " +
        s"batch-only=${(expect -- got).take(5)}")
    // wire columns + the n_tokens stat survive into the curated store
    for (c <- Seq("doc_id", "text", "lang", "source", "n_tokens"))
      assert(curated.columns.contains(c), s"curated store lost column $c")

    // nothing silently dropped: quality rejects carry reason tags, every
    // quality survivor has a decontam verdict, and every dup-dropped doc
    // has a flag row — the audit sinks partition the feed
    val rejects = spark.read.parquet(s"$base/rejects")
    assert(rejects.count() > 0, "quality stage rejected nothing (vacuous)")
    assert(rejects.filter(col("reason").isNull || col("reason") === "").isEmpty)
    // the malformed row surfaced, with the null_text tag
    assert(rejects.filter(col("doc_id") === nullId)
      .select("reason").as[String].collect().toSeq == Seq("null_text"),
      "null-text row did not land in the rejects sink with its reason tag")
    val rejectIds = rejects.select("doc_id").as[Long].collect().toSet
    val qualityIds = quality.select("doc_id").as[Long].collect().toSet
    val trainIds = train.select("doc_id").as[Long].collect().toSet
    assert(rejectIds == trainIds -- qualityIds,
      "rejects sink does not hold exactly the quality-dropped docs")
    val verdicts = spark.read.parquet(s"$base/decontam")
    assert(verdicts.count() == quality.count())
    // the audit trail carries q57's severity, not just a bit
    for (c <- Seq("n_shared", "n_total", "overlap_bp", "band"))
      assert(verdicts.columns.contains(c), s"decontam audit sink lost severity column $c")
    val flaggedIds = spark.read.parquet(s"$base/flags")
      .select("doc_id").as[Long].collect().toSet
    assert(droppedByDup.subsetOf(flaggedIds))
    // and the standing index ingested exactly the clean docs
    assert(spark.read.parquet(s"$base/index/sets").select("doc_id").distinct().count()
      == clean.count())
  }

  test("a nonzero maxOverlapBp admits trace overlap and drops copied passages, auditable") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_scurate_tol_").toString
    val evalWords = "e1 e2 e3 e4 e5"
    // doc 1: exactly one shared 5-gram out of 100 distinct shingles →
    // 100 bp ('partial'); dropped under the strict default, admitted at
    // tolerance 100. doc 2: 1 shared of 6 shingles → 1666 bp
    // ('contaminated') — dropped at either setting
    val trace = s"$evalWords " + (1 to 99).map(i => s"w$i").mkString(" ")
    val copied = s"$evalWords x1 x2 x3 x4 x5"
    Seq((1L, trace, "en", "s", 0L), (2L, copied, "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$base/feed/chunk=0")
    val eval = Seq((100L, evalWords)).toDF("doc_id", "text")

    val q = StreamCurate.run(spark, s"$base/feed/chunk=*", s"$base/ckpt",
      s"$base/curated", s"$base/flags", s"$base/decontam", s"$base/rejects",
      s"$base/index", eval, maxOverlapBp = 100)
    q.awaitTermination(120000L)
    assert(!q.isActive)

    val curated = spark.read.parquet(s"$base/curated")
      .select("doc_id").as[Long].collect().toSet
    assert(curated == Set(1L),
      s"tolerance 100 bp should admit the trace doc and drop the copy: $curated")
    val verdicts = spark.read.parquet(s"$base/decontam")
      .select("doc_id", "overlap_bp", "band").as[(Long, Long, String)]
      .collect().map { case (id, bp, b) => id -> ((bp, b)) }.toMap
    assert(verdicts(1L) == ((100L, "partial")) && verdicts(2L) == ((1666L, "contaminated")),
      s"severity audit diverged: $verdicts")
  }

  test("LM gate: unfamiliar docs rejected with tag, scores audited == batch scoring") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_scurate_lm_").toString
    val all = Tables.documents(spark, sf)
    val ref = all.filter(col("lang") === "en")
    val model = graft.operators.SearchOps.lmWeights(ref)
    // feed: familiar en docs + planted gibberish whose bigrams the en
    // model has never seen (passes the length/distinct quality rules, so
    // only the LM stage can catch it)
    val maxId = all.agg(max(col("doc_id"))).as[Long].head()
    val gibberish = (1 to 3).map { i =>
      val text = (0 until 30).map(j => s"zx${(i * 31 + j * 7) % 13}qq").mkString(" ")
      (maxId + i, text, "en", "synthetic", 0L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val feed = ref.unionByName(gibberish)
    val half = maxId / 2
    feed.filter(col("doc_id") <= half).coalesce(1).write.parquet(s"$base/feed/chunk=0")
    feed.filter(col("doc_id") > half).coalesce(1).write.parquet(s"$base/feed/chunk=1")
    val eval = Seq((maxId + 100L, "never shared anywhere")).toDF("doc_id", "text")

    val q = StreamCurate.run(spark, s"$base/feed/chunk=*", s"$base/ckpt",
      s"$base/curated", s"$base/flags", s"$base/decontam", s"$base/rejects",
      s"$base/index", eval,
      lmModel = Some(model), minLmPerBigram = 1L, lmDir = s"$base/lm")
    q.awaitTermination(180000L)
    assert(!q.isActive)

    // every gibberish doc rejected with the LM tag, no familiar doc is
    val rejects = spark.read.parquet(s"$base/rejects")
    val lmRejected = rejects.filter(col("reason") === "low_lm_familiarity")
      .select("doc_id").as[Long].collect().toSet
    val gibIds = (1 to 3).map(maxId + _).toSet
    assert(lmRejected == gibIds, s"LM rejects diverged: $lmRejected vs $gibIds")
    val curatedIds = spark.read.parquet(s"$base/curated")
      .select("doc_id").as[Long].collect().toSet
    assert(gibIds.intersect(curatedIds).isEmpty)
    assert(curatedIds.nonEmpty)

    // the audit sink holds a verdict for EVERY quality survivor (the LM
    // stage runs after the quality rules), and the streamed scores equal
    // batch lmScore of the same docs (the model is static, so
    // micro-batching must not change a single score)
    val tokens = split(col("text"), " ")
    val quality = feed
      .withColumn("n_tokens", size(tokens))
      .withColumn("n_distinct", size(array_distinct(tokens)))
      .filter(col("n_tokens") >= 10 &&
        col("n_distinct") * 100 >= col("n_tokens") * 30)
    val audited = spark.read.parquet(s"$base/lm")
      .select("doc_id", "n_bigrams", "n_hits", "lm_score")
      .as[(Long, Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(audited.keySet == quality.select("doc_id").as[Long].collect().toSet,
      "every quality survivor needs an LM verdict row")
    val batchScores = graft.operators.SearchOps
      .lmScore(quality.select(col("doc_id"), col("text")), model)
      .as[(Long, Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(audited == batchScores, "streamed LM scores diverged from batch scoring")
  }

  test("language gate: off-list langs rejected with lang_<pred> tag; " +
    "drained verdicts == batch predict; allowed langs flow on") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_scurate_lang_").toString
    // q170's constructed six-language corpus; model trained on all of it
    val corpus = graft.operators.LangIdOps
      .syntheticLangText(Tables.documents(spark, sf))
      .withColumn("lang", col("true_lang"))
      .withColumn("source", lit("synthetic"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val model = graft.operators.LangIdOps
      .trainModel(corpus.select(col("doc_id"), col("true_lang"), col("text")))
      .persist()
    val feed = corpus.drop("true_lang")
    val maxId = feed.agg(max(col("doc_id"))).as[Long].head()
    val half = maxId / 2
    feed.filter(col("doc_id") <= half).coalesce(1).write.parquet(s"$base/feed/chunk=0")
    feed.filter(col("doc_id") > half).coalesce(1).write.parquet(s"$base/feed/chunk=1")
    val eval = Seq((maxId + 100L, "never shared anywhere")).toDF("doc_id", "text")

    val q = StreamCurate.run(spark, s"$base/feed/chunk=*", s"$base/ckpt",
      s"$base/curated", s"$base/flags", s"$base/decontam", s"$base/rejects",
      s"$base/index", eval,
      langModel = Some(model), langAllow = Seq("en", "fr"),
      langDir = s"$base/lang")
    q.awaitTermination(180000L)
    assert(!q.isActive)

    // every non-en/fr doc is rejected with its predicted-language tag
    val truth = corpus.select(col("doc_id"), col("true_lang"))
      .as[(Long, String)].collect().toMap
    val rejects = spark.read.parquet(s"$base/rejects")
      .filter(col("reason").startsWith("lang_"))
      .select(col("doc_id"), col("reason")).as[(Long, String)].collect()
    assert(rejects.nonEmpty)
    rejects.foreach { case (id, reason) =>
      assert(reason == "lang_" + truth(id), s"doc $id tagged $reason")
      assert(!Set("en", "fr").contains(truth(id)))
    }
    val curatedIds = spark.read.parquet(s"$base/curated")
      .select("doc_id").as[Long].collect().toSet
    assert(curatedIds.nonEmpty)
    curatedIds.foreach(id => assert(Set("en", "fr").contains(truth(id))))
    // nothing lost: every corpus doc is either curated, a lang reject,
    // another stage's reject, or a near-dup flag
    val allRejects = spark.read.parquet(s"$base/rejects")
      .select("doc_id").as[Long].collect().toSet
    val flagged = spark.read.parquet(s"$base/flags")
      .select("doc_id").as[Long].collect().toSet
    assert(truth.keySet.subsetOf(curatedIds ++ allRejects ++ flagged))

    // drained audit verdicts == batch predict under the same model
    val audited = spark.read.parquet(s"$base/lang")
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    val batchPred = graft.operators.LangIdOps
      .predict(corpus.select(col("doc_id"), col("text")), model)
      .as[(Long, String)].collect().toMap
    // the audit sink covers quality SURVIVORS (the gate runs after
    // quality); each of its verdicts equals the batch prediction
    assert(audited.nonEmpty)
    audited.foreach { case (id, p) => assert(batchPred(id) == p, s"doc $id") }
    model.unpersist()
  }

  test("HTML front stage: markup extracts to text before curation; empty extracts are tagged rejects") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_scurate_html_").toString
    // real docs wrapped in the q122 synthetic markup, plus one document
    // whose markup extracts to NOTHING (script-only page) — it must land
    // in the rejects sink with the empty_html_extract tag, never vanish
    val real = Tables.documents(spark, sf).filter(col("doc_id") % 4 === 0)
      .limit(30).select(col("doc_id"), col("text"), col("lang"), col("source"))
    val maxId = real.agg(max(col("doc_id"))).as[Long].head()
    val wrapped = graft.operators.HtmlOps.syntheticHtml(real)
      .join(real.drop("text"), Seq("doc_id"))
    val scriptOnly = Seq((maxId + 1L, "<script>only(code)</script>", "en", "synthetic"))
      .toDF("doc_id", "html", "lang", "source")
    wrapped.unionByName(scriptOnly).coalesce(1).write.parquet(s"$base/feed/chunk=0")
    val eval = Seq((maxId + 100L, "never shared anywhere at all ok")).toDF("doc_id", "text")

    val q = StreamCurate.run(spark, s"$base/feed/chunk=*", s"$base/ckpt",
      s"$base/curated", s"$base/flags", s"$base/decontam", s"$base/rejects",
      s"$base/index", eval, htmlCol = Some("html"))
    q.awaitTermination(180000L)
    assert(!q.isActive)

    // the curated text is the EXTRACTION (blocks joined by newline),
    // byte-equal to the batch q122 chain over the same markup
    val curated = spark.read.parquet(s"$base/curated")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(curated.nonEmpty, "nothing curated — fixture broken")
    val expect = wrapped
      .select(col("doc_id"), graft.operators.HtmlOps.htmlToText(col("html")).as("t"))
      .as[(Long, String)].collect().toMap
    curated.foreach { case (id, text) =>
      assert(text == expect(id), s"doc $id curated text != extraction")
      assert(text.contains("\n"), s"doc $id lost block structure")
    }
    val rejects = spark.read.parquet(s"$base/rejects")
    val emptyTagged = rejects
      .filter(col("reason").contains("empty_html_extract"))
      .select("doc_id").as[Long].collect().toSet
    assert(emptyTagged == Set(maxId + 1L),
      s"script-only page not tagged as empty extract: $emptyTagged")
  }

  test("WARC lane: gzip archives stream end-to-end; drained equals the batch " +
    "q135 extraction; bad records dead-letter with reasons") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_scurate_warc_").toString
    // batch 1: the production-shape gzip-member corpus over real docs
    val docs = Tables.documents(spark, sf)
    val archives = graft.operators.WarcOps.syntheticWarcGz(docs)
    archives.coalesce(1).write.parquet(s"$base/feed/chunk=0")
    val maxId = docs.agg(max(col("doc_id"))).as[Long].head()
    // batch 2: a hand-built archive — a good record, a 404, a bad-URI
    // record, and a CORRUPT gzip member in the middle (must drop while
    // its neighbors survive)
    def rec(uri: String, body: String, status: String = "200 OK"): String = {
      val http = s"HTTP/1.1 $status\r\nContent-Type: text/html\r\n\r\n$body"
      val octets = http.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
      s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
        s"Content-Length: $octets\r\n\r\n$http\r\n\r\n"
    }
    val goodId = maxId + 7L
    val goodHtml = "<p>twelve distinct plain words make this page pass " +
      "every quality gate fine</p>"
    val corrupt = {
      val m = graft.operators.WarcOps.gzipMembers(
        Seq(rec("https://example.test/doc/999999999", "<p>never seen</p>")))
      m(14) = (m(14) ^ 0x55).toByte
      m
    }
    val custom =
      graft.operators.WarcOps.gzipMembers(Seq(
        rec(s"https://example.test/doc/$goodId", goodHtml))) ++
      corrupt ++
      graft.operators.WarcOps.gzipMembers(Seq(
        rec(s"https://example.test/doc/${maxId + 8}", "<p>gone</p>", "404 Not Found"),
        rec("https://example.test/unattributable", "<p>no id in this uri</p>")))
    Seq((99L, custom)).toDF("group_id", "warc")
      .coalesce(1).write.parquet(s"$base/feed/chunk=1")
    val eval = Seq((maxId + 100L, "never shared anywhere at all ok")).toDF("doc_id", "text")

    val q = StreamCurate.run(spark, s"$base/feed/chunk=*", s"$base/ckpt",
      s"$base/curated", s"$base/flags", s"$base/decontam", s"$base/rejects",
      s"$base/index", eval, htmlCol = Some("html"),
      warcCol = Some("warc"), warcRejectsDir = s"$base/warc_rejects")
    q.awaitTermination(240000L)
    assert(!q.isActive)

    // drained == batch: every curated doc's extracted text hashes to the
    // q135 oracle-pinned text_sha (archive + member-inflate + extraction
    // all collapse)
    def sha(x: String) = java.security.MessageDigest.getInstance("SHA-256")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expectSha = graft.operators.WarcOps.q135WarcGzExtract(spark, sf)
      .select("doc_id", "text_sha").as[(Long, String)].collect().toMap
    val curated = spark.read.parquet(s"$base/curated")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(curated.size > 100, s"only ${curated.size} docs curated")
    curated.foreach { case (id, text) =>
      if (id <= maxId)
        assert(sha(text) == expectSha(id), s"doc $id diverged from batch q135")
    }
    assert(curated.contains(goodId), "good custom record must curate")
    assert(curated(goodId) == "twelve distinct plain words make this page " +
      "pass every quality gate fine")
    assert(!curated.keySet.contains(999999999L), "corrupt member leaked")
    // per-record dead-letters carry their reasons
    val wr = spark.read.parquet(s"$base/warc_rejects")
      .select("url", "reason").as[(String, String)].collect().toMap
    assert(wr(s"https://example.test/doc/${maxId + 8}") == "http_status")
    assert(wr("https://example.test/unattributable") == "bad_uri")
  }

  test("PII stage: no raw identifier reaches any sink; audit counts ride along") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_scurate_pii_").toString
    val real = Tables.documents(spark, sf).filter(col("doc_id") % 4 === 1)
      .limit(20).select(col("doc_id"), col("text"), col("lang"), col("source"))
    // plant an email + a Luhn-valid card into every doc's text
    val planted = real.withColumn("text",
      concat(col("text"), lit(" mail bob@leak.example.com pan 4111111111111111")))
    planted.coalesce(1).write.parquet(s"$base/feed/chunk=0")
    val maxId = real.agg(max(col("doc_id"))).as[Long].head()
    val eval = Seq((maxId + 100L, "never shared anywhere at all ok")).toDF("doc_id", "text")

    val q = StreamCurate.run(spark, s"$base/feed/chunk=*", s"$base/ckpt",
      s"$base/curated", s"$base/flags", s"$base/decontam", s"$base/rejects",
      s"$base/index", eval, piiRedact = true)
    q.awaitTermination(180000L)
    assert(!q.isActive)

    val curated = spark.read.parquet(s"$base/curated")
    assert(curated.count() > 0)
    val texts = curated.select("text").as[String].collect()
    texts.foreach { t =>
      assert(!t.contains("bob@leak.example.com") && !t.contains("4111111111111111"),
        "raw identifier leaked into the curated store")
      assert(t.contains("[EMAIL]") && t.contains("[CARD]"), "redaction markers missing")
    }
    // audit columns survive into the curated store
    val counts = curated.select("n_emails", "n_cards_valid")
      .as[(Long, Long)].collect()
    counts.foreach { case (e, c) => assert(e == 1L && c == 1L) }
  }
}
