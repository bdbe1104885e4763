package graft.streaming

import graft.{SparkTestSession, Tables}
import graft.operators.{FeedOps, FrontierOps, SitemapOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** The streaming frontier: config files (robots/sitemaps/feeds) parsed
  * by the real q141/q145/q149 parsers into standing dimensions, a
  * rank-banded discovery feed drained across micro-batches, and the
  * drained schedule compared row-for-row against batch q154 — the
  * per-host state must carry crawl ranks and fetch waves over batch
  * boundaries exactly.
  */
class StreamFrontierSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("long stream: state stays bounded across repeated compaction " +
    "cycles (8 batches, K=3) — fulls at {2,5}, GC to latest+anchor, " +
    "delta count bounded by K, per-batch deltas batch-sized") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_sfrontier_long_").toString
    val docIds = Tables.documents(spark, sf).select("doc_id")
      .as[Long].collect().toSeq.sorted
    Files.createDirectories(Paths.get(s"$base/config"))
    for (h <- 0L until 8L) {
      val ids = docIds.filter(_ % 8 == h)
      Files.write(Paths.get(s"$base/config/robots_h$h.txt"),
        FrontierOps.schedulerRobots(h).getBytes("UTF-8"))
      SitemapOps.buildHostSitemaps(h, ids).foreach { case (name, bytes) =>
        Files.write(Paths.get(s"$base/config/sitemap_h${h}_$name"), bytes)
      }
    }
    // 8 chunks of ~1/8th of the corpus each (by id band), in id order so
    // per-host arrival order matches rank order within each host band
    val bands = docIds.grouped(math.max(1, docIds.size / 8 + 1)).toSeq
    bands.zipWithIndex.foreach { case (ids, c) =>
      ids.toDF("doc_id").coalesce(1).write.parquet(s"$base/feed/chunk=$c")
    }
    val nBatches = bands.length
    val q = StreamFrontier.run(spark, s"$base/feed/chunk=*", s"$base/ckpt",
      s"$base/schedule", s"$base/state", s"$base/rejects", s"$base/config",
      compactEvery = 3)
    q.awaitTermination(300000L)
    assert(!q.isActive)
    // fulls only at compaction batches (b+1)%3==0, GC'd to latest+anchor
    val fulls = (0 until nBatches)
      .filter(b => Files.exists(Paths.get(s"$base/state/batch_id=$b")))
    val expectFulls = (0 until nBatches).filter(b => (b + 1) % 3 == 0)
    assert(fulls == expectFulls.takeRight(2).sorted,
      s"fulls $fulls != latest+anchor of $expectFulls")
    // deltas: only those newer than the anchor survive — bounded by ~2K,
    // never the whole stream's worth
    val deltas = (0 until nBatches)
      .filter(b => Files.exists(Paths.get(s"$base/state/deltas/batch_id=$b")))
    val anchor = expectFulls.takeRight(2).head
    assert(deltas.forall(_ > anchor), s"deltas $deltas ≤ anchor $anchor")
    assert(deltas.size <= 2 * 3, s"delta count ${deltas.size} unbounded")
    // each surviving seen-delta holds ONE batch's rows, not a cumulative set
    deltas.foreach { b =>
      val rows = spark.read.parquet(s"$base/state/seen/deltas/batch_id=$b")
        .count()
      assert(rows <= bands(b).size.toLong,
        s"batch $b delta $rows rows > its chunk ${bands(b).size}")
    }
    // the drained schedule covers every doc exactly once
    assert(spark.read.parquet(s"$base/schedule").count() == docIds.size.toLong)
  }

  test("drained schedule == batch q154; per-host ranks survive batch " +
    "boundaries; unknown URLs dead-letter") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_sfrontier_").toString

    // ---- config dir: per-host robots + sitemap tree + feed, written
    // as FILES and parsed back by the lane's real parsers
    val docIds = Tables.documents(spark, sf).select("doc_id")
      .as[Long].collect().toSeq.sorted
    Files.createDirectories(Paths.get(s"$base/config"))
    for (h <- 0L until 8L) {
      val ids = docIds.filter(_ % 8 == h)
      Files.write(Paths.get(s"$base/config/robots_h$h.txt"),
        FrontierOps.schedulerRobots(h).getBytes("UTF-8"))
      SitemapOps.buildHostSitemaps(h, ids).foreach { case (name, bytes) =>
        Files.write(Paths.get(s"$base/config/sitemap_h${h}_$name"), bytes)
      }
      Files.write(Paths.get(s"$base/config/feed_h$h.xml"),
        FeedOps.buildFeed(s"h$h.example.test", h, ids).getBytes("UTF-8"))
    }

    // ---- feed: three chunks banded by the BATCH schedule's per-host
    // rank (the lane's online contract: per-host arrival order must
    // match rank order), plus one unknown URL for the dead-letter path
    val batchRows = FrontierOps.q154FrontierSchedule(spark, sf).collect()
    val rankOf = batchRows.map(r => r.getLong(0) -> r.getLong(8)).toMap
    def chunkOf(id: Long): Int = {
      val r = rankOf(id)
      if (r < 0) (id % 3).toInt // disallowed: any order
      else if (r <= 20) 0
      else if (r <= 40) 1
      else 2
    }
    val bogus = docIds.max + 999
    for (c <- 0 to 2) {
      // chunk 2 repeats its first id: an in-batch duplicate discovery
      // must schedule ONCE (else the drained row count diverges)
      val base0 = docIds.filter(chunkOf(_) == c)
      val ids = base0 ++
        (if (c == 1) Seq(bogus) else Nil) ++
        (if (c == 2) base0.take(1) else Nil)
      ids.toDF("doc_id").coalesce(1)
        .write.parquet(s"$base/feed/chunk=$c")
    }

    val q = StreamFrontier.run(spark, s"$base/feed/chunk=*", s"$base/ckpt",
      s"$base/schedule", s"$base/state", s"$base/rejects", s"$base/config",
      compactEvery = 2)
    q.awaitTermination(180000L)
    assert(!q.isActive)

    // ---- drained == batch, every column (rank bands vs q154, timed
    // politeness vs q182 — both contracts on one drained schedule)
    val cols = Seq("doc_id", "host", "path", "allowed", "rule",
      "lastmod_day", "priority_tenths", "fresh_lag", "crawl_rank",
      "fetch_wave")
    val drained = spark.read.parquet(s"$base/schedule")
      .select(cols.map(col): _*).orderBy("doc_id").collect().map(_.toSeq)
    val batch = FrontierOps.q154FrontierSchedule(spark, sf)
      .select(cols.map(col): _*).orderBy("doc_id").collect().map(_.toSeq)
    assert(drained.length == batch.length,
      s"${drained.length} vs ${batch.length}")
    drained.zip(batch).foreach { case (d, b) => assert(d == b, s"$d != $b") }
    val colsT = Seq("doc_id", "host", "path", "allowed", "rule",
      "lastmod_day", "priority_tenths", "fresh_lag", "crawl_rank",
      "crawl_delay", "fetch_at_s", "time_wave")
    val drainedT = spark.read.parquet(s"$base/schedule")
      .select(colsT.map(col): _*).orderBy("doc_id").collect().map(_.toSeq)
    val batchT = FrontierOps.q182FrontierTiming(spark, sf)
      .select(colsT.map(col): _*).orderBy("doc_id").collect().map(_.toSeq)
    drainedT.zip(batchT).foreach { case (d, b) => assert(d == b, s"$d != $b") }
    // cross-batch continuity actually exercised: chunk 1+ carried ranks
    assert(batchRows.exists(r => r.getLong(8) > 20),
      "the corpus must produce ranks past the first band")
    // timed interleaving: hosts with different Crawl-delays fill the
    // first 60-second band (fetch_at 0..59) at different depths — a
    // 1-s host ranks up to 60 deep while a 3-s host stops at 20 (or
    // its corpus runs out)
    val byHost = spark.read.parquet(s"$base/schedule")
      .filter(col("allowed"))
      .select("host", "crawl_delay", "crawl_rank", "time_wave")
      .as[(String, Long, Long, Long)].collect().groupBy(_._1)
    val firstBandDepths = byHost.map { case (_, rows) =>
      val d = rows.head._2
      val total = rows.length.toLong
      val expect = math.min(total, 59L / d + 1)
      val got = rows.filter(_._4 == 1L).map(_._3).max
      (d, got, expect)
    }.toSeq
    firstBandDepths.foreach { case (d, got, expect) =>
      assert(got == expect, s"delay $d: band-1 depth $got != $expect")
    }
    assert(firstBandDepths.map(_._1).distinct.size >= 2,
      "the corpus must exercise at least two distinct delays")

    // ---- the bogus URL dead-lettered typed
    val rejects = spark.read.parquet(s"$base/rejects")
      .select("doc_id", "reason").as[(Long, String)].collect()
    assert(rejects.toSeq == Seq((bogus, "unknown_url")))

    // ---- state: PER-BATCH WRITES ARE DELTAS (O(batch), not
    // O(corpus)); compaction folds them into a full generation every
    // `compactEvery` batches; the corpus-grain URL dimension published
    // as parquet (never a driver Seq)
    assert(Files.exists(Paths.get(s"$base/state/batch_id=1")),
      "compaction must write a full generation at batch 1 (K=2)")
    assert(!Files.exists(Paths.get(s"$base/state/batch_id=0")) &&
      !Files.exists(Paths.get(s"$base/state/batch_id=2")),
      "non-compaction batches must write NO full generation")
    for (b <- 0 to 2) {
      assert(Files.exists(Paths.get(s"$base/state/deltas/batch_id=$b")))
      assert(Files.exists(Paths.get(s"$base/state/seen/deltas/batch_id=$b")))
    }
    // per-batch state bytes scale with the BATCH: batch 2's seen delta
    // holds exactly chunk 2's distinct doc_ids (the in-batch duplicate
    // dedups), not the cumulative seen-set; its counter delta holds at
    // most the 8 hosts, not a counter per corpus host ever seen
    val chunk2Ids = docIds.count(chunkOf(_) == 2)
    val seenDelta2 = spark.read
      .parquet(s"$base/state/seen/deltas/batch_id=2").count()
    assert(seenDelta2 == chunk2Ids, s"$seenDelta2 != $chunk2Ids")
    val cumulativeSeen = spark.read.parquet(s"$base/state/seen/batch_id=1")
      .count()
    assert(cumulativeSeen == docIds.count(c => chunkOf(c) <= 1),
      "the batch-1 compaction carries chunks 0+1")
    val counterDelta2 = spark.read
      .parquet(s"$base/state/deltas/batch_id=2").count()
    assert(counterDelta2 <= 8, s"counter delta must be host-sized: $counterDelta2")
    assert(Files.exists(Paths.get(s"$base/state/urlattrs_dim/_SUCCESS")))
    val dimRows = spark.read.parquet(s"$base/state/urlattrs_dim").count()
    assert(dimRows == docIds.size, s"dim rows $dimRows != ${docIds.size}")
    assert(Files.exists(Paths.get(s"$base/state/hostmeta_dim/_SUCCESS")))
    val hostRows = spark.read.parquet(s"$base/state/hostmeta_dim")
      .select("h", "crawl_delay").as[(Long, Long)].collect().toMap
    assert(hostRows.size == 8 &&
      (0L until 8L).forall(h => hostRows(h) == 1 + h % 3),
      s"host dim must carry each host's parsed Crawl-delay: $hostRows")

    // ---- replay: a fresh checkpoint over the same feed/sinks must
    // reconverge — first-write-wins skips committed batches, batch 0's
    // state rebuilds from nothing (its GC'd generation is recomputed
    // identically), and the drained schedule stays byte-identical
    val q2 = StreamFrontier.run(spark, s"$base/feed/chunk=*", s"$base/ckpt2",
      s"$base/schedule", s"$base/state", s"$base/rejects", s"$base/config",
      compactEvery = 2)
    q2.awaitTermination(180000L)
    assert(!q2.isActive)
    val replayed = spark.read.parquet(s"$base/schedule")
      .select(cols.map(col): _*).orderBy("doc_id").collect().map(_.toSeq)
    assert(replayed.length == batch.length, "replay must not duplicate")
    replayed.zip(batch).foreach { case (d, b) => assert(d == b, s"$d != $b") }
    val rejects2 = spark.read.parquet(s"$base/rejects")
      .select("doc_id", "reason").as[(Long, String)].collect()
    assert(rejects2.toSeq == Seq((bogus, "unknown_url")),
      "replay must not duplicate dead-letters")

    // ---- recrawl semantics: an UNCHANGED rediscovery is a no-op, a
    // lastmod-BUMPED one re-admits and ranks at the host's next offset
    val allowedRows = batchRows.filter(_.getBoolean(3))
    val unchanged = allowedRows.head
    val bumped = allowedRows.last
    val hostAllowed = allowedRows.count(_.getString(1) == bumped.getString(1))
    Seq(
      (unchanged.getLong(0), unchanged.getLong(5), unchanged.getLong(6)),
      (bumped.getLong(0), bumped.getLong(5) + 7L, bumped.getLong(6)))
      .toDF("doc_id", "lastmod_day", "priority_tenths")
      .coalesce(1).write.parquet(s"$base/feed/chunk=3")
    val before = spark.read.parquet(s"$base/schedule").count()
    val hint = spark.read.parquet(s"$base/feed/chunk=3").schema
    val q3 = StreamFrontier.run(spark, s"$base/feed/chunk=*", s"$base/ckpt3",
      s"$base/schedule", s"$base/state", s"$base/rejects", s"$base/config",
      schemaHint = Some(hint), compactEvery = 2)
    q3.awaitTermination(180000L)
    // batch 3 compacts again: fulls {1,3} retained (latest + replay
    // anchor), deltas ≤ the anchor GC'd, deltas {2,3} retained
    assert(Files.exists(Paths.get(s"$base/state/batch_id=3")) &&
      Files.exists(Paths.get(s"$base/state/batch_id=1")))
    assert(!Files.exists(Paths.get(s"$base/state/deltas/batch_id=0")) &&
      !Files.exists(Paths.get(s"$base/state/deltas/batch_id=1")),
      "deltas at or before the predecessor full must be GC'd")
    assert(Files.exists(Paths.get(s"$base/state/deltas/batch_id=2")) &&
      Files.exists(Paths.get(s"$base/state/deltas/batch_id=3")))
    val after = spark.read.parquet(s"$base/schedule")
    assert(after.count() == before + 1,
      "exactly the bumped rediscovery must reschedule")
    assert(after.filter(col("doc_id") === unchanged.getLong(0)).count() == 1,
      "an unchanged rediscovery must be a no-op")
    val re = after.filter(col("doc_id") === bumped.getLong(0))
      .orderBy(col("crawl_rank").desc)
      .select("lastmod_day", "crawl_rank").as[(Long, Long)].collect()
    assert(re.length == 2, "the recrawl is a new fetch task, not a rewrite")
    assert(re.head == (bumped.getLong(5) + 7L, hostAllowed + 1L),
      s"${re.head} != (${bumped.getLong(5) + 7L}, ${hostAllowed + 1L})")
  }
}
