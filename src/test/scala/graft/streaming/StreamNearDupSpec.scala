package graft.streaming

import graft.{SparkTestSession, Tables}
import graft.operators.DedupOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Ingest-time near-dup parity: streaming the corpus in 3 micro-batches
  * through the LSH guard flags exactly the pairs the batch operator
  * (q20's `minhashNearDup`, == brute force at threshold 0.9) finds over
  * the accumulated feed, with the LATER document flagged against the
  * earlier one.
  */
class StreamNearDupSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("streaming near-dup flags (3 micro-batches) == batch minhashNearDup pairs") {
    val base = Files.createTempDirectory("graft_sneardup_").toString
    val docs = Tables.documents(spark, sf)
    val n = docs.count()
    // chunks in doc_id order: arrival order == id order, so the stream's
    // "earlier" orientation matches the batch operator's doc_a < doc_b
    val ranked = docs.withColumn("rnk", row_number().over(Window.orderBy(col("doc_id"))))
    for ((lo, hi, i) <- Seq(
        (1L, n / 3, 0), (n / 3 + 1, 2 * n / 3, 1), (2 * n / 3 + 1, n, 2)))
      ranked.filter(col("rnk").between(lo, hi)).drop("rnk")
        .coalesce(1).write.parquet(s"$base/feed/chunk=$i")

    val q = StreamNearDup.run(spark, s"$base/feed/chunk=*", s"$base/ckpt",
      s"$base/flags", s"$base/index")
    q.awaitTermination(120000L)
    assert(!q.isActive, "stream did not drain with AvailableNow")

    val streamed = spark.read.parquet(s"$base/flags")
      .select(col("dup_of"), col("doc_id"), col("jac"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val batch = DedupOps.minhashNearDup(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(batch.nonEmpty, "corpus has no near-dup pairs; parity test is vacuous")
    assert(streamed.keySet == batch.keySet,
      s"pair sets diverged: stream-only=${(streamed.keySet -- batch.keySet).take(5)} " +
        s"batch-only=${(batch.keySet -- streamed.keySet).take(5)}")
    streamed.foreach { case (k, jac) =>
      assert(math.abs(jac - batch(k)) < 1e-12, s"jaccard diverged for $k")
    }
    // cross-batch detection really happened: at least one flagged pair
    // spans two different micro-batches (its docs sit in different thirds).
    // One collected rank map — not a Spark job per pair.
    val bounds = Seq(n / 3, 2 * n / 3)
    val rankOf = ranked.select("doc_id", "rnk").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    def chunkOf(id: Long): Int = bounds.count(rankOf(id) > _)
    assert(streamed.keySet.exists { case (a, b) => chunkOf(a) != chunkOf(b) },
      "no cross-batch pair was flagged — the standing index saw no use")

    // the index accumulated one replay-idempotent generation per batch
    for (part <- Seq("bands", "sets")) {
      val dirs = new java.io.File(s"$base/index/$part").listFiles
        .map(_.getName).filter(_.startsWith("batch_id=")).sorted.toSeq
      assert(dirs == Seq("batch_id=0", "batch_id=1", "batch_id=2"), s"$part: $dirs")
    }
  }

  test("empty-flag batches still commit their replay marker; LSH params are pinned") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_sneardup_empty_").toString
    Seq((1L, "alpha beta gamma delta"), (2L, "totally different words here"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$base/feed/c0")
    val q = StreamNearDup.run(spark, s"$base/feed/c*", s"$base/ckpt",
      s"$base/flags", s"$base/index")
    q.awaitTermination(120000L)
    assert(!q.isActive)
    // without the marker a crash-replay after the index append would
    // re-derive flags against an index already holding the batch's own
    // entries and write every doc as a jaccard-1.0 self-duplicate; the
    // marker lives under _markers/ so the sink never holds an unreadable
    // parquet-less batch dir
    assert(new java.io.File(s"$base/flags/_markers/0").exists,
      "no-flag batch left no replay marker")
    assert(!new java.io.File(s"$base/flags/batch_id=0").exists,
      "empty batch created a marker-only batch dir (breaks directory readers)")
    // a restart with different banding must refuse the standing index:
    // band keys across parameters are incomparable and would silently
    // miss every cross-batch pair instead
    val ex = intercept[IllegalStateException] {
      StreamNearDup.run(spark, s"$base/feed/c*", s"$base/ckpt2", s"$base/flags2",
        s"$base/index", bands = 24, rowsPerBand = 2)
    }
    assert(ex.getMessage.contains("LSH parameters"))
    // ...and a POPULATED index with no manifest at all is refused too —
    // stamping today's parameters over unknown-parameter entries would
    // make the drift permanently undetectable
    assert(new java.io.File(s"$base/index/_lsh.json").delete())
    val ex2 = intercept[IllegalStateException] {
      StreamNearDup.run(spark, s"$base/feed/c*", s"$base/ckpt3", s"$base/flags3",
        s"$base/index")
    }
    assert(ex2.getMessage.contains("no _lsh.json"))
  }

  test("standing band index joins as a bucketed scan — no Exchange on the index side") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_sneardup_plan_").toString
    Seq((1L, "alpha beta gamma delta"), (2L, "totally different words here"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$base/feed/c0")
    val q = StreamNearDup.run(spark, s"$base/feed/c*", s"$base/ckpt",
      s"$base/flags", s"$base/index")
    q.awaitTermination(120000L)
    assert(!q.isActive)
    // pin the sort-merge path: with broadcast allowed the tiny test index
    // would be broadcast and the assertion would not exercise the layout
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val probeBands = Seq((10L, 1L), (11L, 2L)).toDF("doc_id", "band_key")
      val cands = StreamNearDup.indexCandidates(spark, s"$base/index", probeBands)
      val qe = cands.queryExecution
      val plan = qe.executedPlan.toString
      assert(plan.contains("Bucketed: true"),
        s"standing side is not a bucketed scan:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
      // exactly two shuffles: the arriving batch shuffling INTO the
      // bucket layout, and the distinct over the (tiny) candidate pairs.
      // A third would mean the standing index is being re-shuffled —
      // the grows-with-corpus-age per-batch cost this layout removes.
      // Count REAL shuffle nodes (post-EnsureRequirements, unwrapping the
      // AQE node) — the substring form also matched ReusedExchange/
      // BroadcastExchange text (the round-10 fragility class), and the
      // pre-preparation sparkPlan has no exchanges at all.
      val exec = qe.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val exchanges = exec.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.size
      assert(exchanges == 2,
        s"expected only the arriving batch's shuffle + the candidate distinct, " +
          s"found $exchanges:\n$exec")

      // ...and the sets verification read is partition-pruned to the
      // candidates' doc_buckets: without the pushed filter every batch
      // re-reads the whole O(corpus) shingle-set store
      import spark.implicits._
      val fs = new org.apache.hadoop.fs.Path(s"$base/index")
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val cand = Seq((1L, 99L)).toDF("dup_of", "doc_id")
      val pruned = StreamNearDup.prunedSets(spark, fs, s"$base/index", cand,
        StreamNearDup.DefaultSetsBuckets)
      val setsPlan = pruned.queryExecution.executedPlan.toString
      assert("PartitionFilters: \\[[^\\]]*doc_bucket".r.findFirstIn(setsPlan).isDefined,
        s"sets read is not partition-pruned:\n$setsPlan")
      // the pruned read returns doc 1's set (plus at most its bucket
      // neighbors — pruning is per bucket, not per id)
      val got = pruned.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got.contains(1L), s"pruned sets lost the candidate's set: $got")
      val bucketOfDoc = spark.range(3).toDF("doc_id")
        .select(col("doc_id"),
          CheckpointStream.bucketOf(col("doc_id"), StreamNearDup.DefaultSetsBuckets))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got.forall(id => bucketOfDoc.getOrElse(id, -1) == bucketOfDoc(1L)),
        s"pruned read surfaced a foreign bucket: $got")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("a fresh checkpoint against a populated index is refused (ownership)") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_sneardup_own_").toString
    for (i <- 0 to 1)
      Seq((i.toLong + 1, s"some words for document number $i"))
        .toDF("doc_id", "text").coalesce(1).write.parquet(s"$base/feed/c$i")
    val q = StreamNearDup.run(spark, s"$base/feed/c*", s"$base/ckpt",
      s"$base/flags", s"$base/index")
    q.awaitTermination(120000L)
    assert(!q.isActive)
    // the index now holds committed generations 0 and 1; a checkpoint that
    // never committed near them would restart batch ids at 0, and the
    // first-write-wins appends would silently skip against stale truth
    val ex = intercept[IllegalStateException] {
      StreamNearDup.run(spark, s"$base/feed/c*", s"$base/ckpt_fresh",
        s"$base/flags_fresh", s"$base/index")
    }
    assert(ex.getMessage.contains("does not own"), ex.getMessage)
    // resuming from the ORIGINAL checkpoint remains legitimate (no-op: the
    // backlog is already committed)
    val q2 = StreamNearDup.run(spark, s"$base/feed/c*", s"$base/ckpt",
      s"$base/flags", s"$base/index")
    q2.awaitTermination(120000L)
    assert(!q2.isActive)
  }

  test("owner stamp closes the batch-0 window: one-generation index refuses a fresh checkpoint") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_sneardup_own0_").toString
    Seq((1L, "some words for the very first document"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$base/feed/c0")
    val q = StreamNearDup.run(spark, s"$base/feed/c0", s"$base/ckpt",
      s"$base/flags", s"$base/index")
    q.awaitTermination(120000L)
    assert(!q.isActive)
    // index holds ONLY batch_id=0 — the window the commit-lead check
    // cannot see. The owner stamp (written at adoption, before any data)
    // must refuse a fresh checkpoint, whose replayed batch 0 would
    // otherwise skip its append and flag every doc against itself
    val ex = intercept[IllegalStateException] {
      StreamNearDup.run(spark, s"$base/feed/c0", s"$base/ckpt_fresh",
        s"$base/flags_fresh", s"$base/index")
    }
    assert(ex.getMessage.contains("does not own"), ex.getMessage)
    // crash-replay from the true owner stays admitted
    val q2 = StreamNearDup.run(spark, s"$base/feed/c0", s"$base/ckpt",
      s"$base/flags", s"$base/index")
    q2.awaitTermination(120000L)
    assert(!q2.isActive)
    // a legitimately relocated checkpoint re-adopts by deleting the stamp
    val fs = new org.apache.hadoop.fs.Path(s"$base/index")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$base/index/_owner.json"), false)
    // stamp-less + populated falls to the legacy commit-lead check, which
    // admits the true owner — and the admitted run RE-ADOPTS (re-stamps),
    // so the index is protected again from here on
    val q3 = StreamNearDup.run(spark, s"$base/feed/c0", s"$base/ckpt",
      s"$base/flags", s"$base/index")
    q3.awaitTermination(120000L)
    assert(!q3.isActive)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$base/index/_owner.json")),
      "re-adoption did not re-stamp the owner")
    // a stamp-less POPULATED index cannot be adopted by a PRISTINE
    // checkpoint either (first-comer adoption would lock out the true
    // owner): delete the stamp again and try a brand-new checkpoint
    fs.delete(new org.apache.hadoop.fs.Path(s"$base/index/_owner.json"), false)
    val ex2 = intercept[IllegalStateException] {
      StreamNearDup.run(spark, s"$base/feed/c0", s"$base/ckpt_foreign",
        s"$base/flags_foreign", s"$base/index")
    }
    assert(ex2.getMessage.contains("cannot be the lineage"), ex2.getMessage)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$base/index/_owner.json")),
      "a refused foreign checkpoint must not leave a stolen stamp behind")
  }

  test("non-default bucket counts: layout params flow through manifest, flags unchanged") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_sneardup_buckets_").toString
    val texts = Seq(
      1L -> "alpha beta gamma delta epsilon zeta",
      2L -> "alpha beta gamma delta epsilon zeta", // dup of 1, later batch
      3L -> "one two three four five six")
    texts.zipWithIndex.foreach { case ((id, t), i) =>
      Seq((id, t)).toDF("doc_id", "text").coalesce(1).write.parquet(s"$base/feed/c$i")
      val d = new java.io.File(s"$base/feed/c$i")
      (d +: d.listFiles.toSeq).foreach(_.setLastModified(1700000000000L + i * 60000L))
    }
    val q = StreamNearDup.run(spark, s"$base/feed/c*", s"$base/ckpt",
      s"$base/flags", s"$base/index", bandBuckets = 8, setsBuckets = 4)
    q.awaitTermination(120000L)
    assert(!q.isActive)
    val flags = spark.read.parquet(s"$base/flags")
      .select("doc_id", "dup_of").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(flags == Set((2L, 1L)), s"flags under non-default buckets: $flags")
    // the manifest pins BOTH layout params: a probe under different counts
    // is refused (the physical layouts are incompatible)
    val ex = intercept[IllegalStateException] {
      StreamNearDup.probeIndex(spark, s"$base/index",
        Seq((9L, "x")).toDF("doc_id", "text"))
    }
    assert(ex.getMessage.contains("LSH parameters"))
    // ...and under the matching counts the probe works
    val probed = StreamNearDup.probeIndex(spark, s"$base/index",
      Seq((9L, "one two three four five six")).toDF("doc_id", "text"),
      bandBuckets = 8, setsBuckets = 4)
      .select("dup_of").collect().map(_.getLong(0)).toSet
    assert(probed == Set(3L), s"probe saw $probed")
  }

  test("engine restart: catalog loss is re-derived from the filesystem, stream resumes") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_sneardup_restart_").toString
    Seq((1L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$base/feed/c0")
    val q = StreamNearDup.run(spark, s"$base/feed/c*", s"$base/ckpt",
      s"$base/flags", s"$base/index")
    q.awaitTermination(120000L)
    assert(!q.isActive)
    // simulate an engine restart: the in-memory catalog entry is gone but
    // the on-disk index survives — ensureBandsTable must re-register it
    // (CREATE + RECOVER PARTITIONS) instead of reading an empty table
    spark.sql(s"DROP TABLE IF EXISTS ${StreamNearDup.bandsTableName(s"$base/index")}")
    // a new near-copy arrives after the restart; resuming from the SAME
    // checkpoint must flag it against the pre-restart document
    Seq((2L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$base/feed/c1")
    val q2 = StreamNearDup.run(spark, s"$base/feed/c*", s"$base/ckpt",
      s"$base/flags", s"$base/index")
    q2.awaitTermination(120000L)
    assert(!q2.isActive)
    val flags = spark.read.parquet(s"$base/flags")
      .select("doc_id", "dup_of").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(flags == Set((2L, 1L)),
      s"post-restart batch did not flag against the pre-restart index: $flags")
    // and the probe path re-derives the catalog entry the same way
    spark.sql(s"DROP TABLE IF EXISTS ${StreamNearDup.bandsTableName(s"$base/index")}")
    val probed = StreamNearDup.probeIndex(spark, s"$base/index",
      Seq((9L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text"))
      .select("dup_of").collect().map(_.getLong(0)).toSet
    assert(probed == Set(1L, 2L), s"probe after catalog loss saw $probed")
  }

  test("index retention GC drops oldest generations in lockstep; probe respects the window") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_sneardup_gc_").toString
    // three single-doc micro-batches with mutually distinct texts
    val texts = Seq(
      1L -> "alpha beta gamma delta epsilon",
      2L -> "one two three four five",
      3L -> "red green blue yellow purple")
    texts.zipWithIndex.foreach { case ((id, t), i) =>
      Seq((id, t)).toDF("doc_id", "text").coalesce(1).write.parquet(s"$base/feed/c$i")
      val d = new java.io.File(s"$base/feed/c$i")
      (d +: d.listFiles.toSeq).foreach(_.setLastModified(1700000000000L + i * 60000L))
    }
    val q = StreamNearDup.run(spark, s"$base/feed/c*", s"$base/ckpt",
      s"$base/flags", s"$base/index")
    q.awaitTermination(120000L)
    assert(!q.isActive)

    StreamNearDup.gcIndex(spark, s"$base/index", keepBatches = 2)
    for (part <- Seq("bands", "sets")) {
      val dirs = new java.io.File(s"$base/index/$part").listFiles
        .map(_.getName).filter(_.startsWith("batch_id=")).sorted.toSeq
      assert(dirs == Seq("batch_id=1", "batch_id=2"),
        s"$part not retained in lockstep: $dirs")
    }
    // probe: a copy of the DROPPED doc goes undetected (the windowed
    // trade), a copy of a KEPT doc is flagged against it
    val probeDocs = Seq(
      (10L, "alpha beta gamma delta epsilon"), // == doc 1, aged out
      (11L, "red green blue yellow purple")) // == doc 3, retained
      .toDF("doc_id", "text")
    val flags = StreamNearDup.probeIndex(spark, s"$base/index", probeDocs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(flags == Set((11L, 3L)), s"probe saw $flags")
    // probing an absent index is an empty result, not a crash
    assert(StreamNearDup.probeIndex(spark, s"$base/no_such_index", probeDocs)
      .collect().isEmpty)
  }
}
