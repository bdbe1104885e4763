package graft.operators

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Persisted IVF index (VERDICT r6 item 3): build once, probe many times.
  * Gates: exact equality of the indexed probe with the in-query path over
  * a locally built index, a no-retrain proof (second probe touches no
  * index file), the partition-pruning plan assertion (the probe reads only
  * probed cid dirs), and the registered q38 parity legs (all counts 10 —
  * the oracle-pinned shape).
  */
class IvfIndexSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def corpus() = Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  private def queriesOf(c: org.apache.spark.sql.DataFrame) =
    c.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))

  test("indexed probe == in-query IVF bit-for-bit; reprobe does not retrain") {
    val dir = Files.createTempDirectory("graft_ivf_").toString + "/index"
    val c = corpus()
    SimilarityOps.buildIvfIndex(c, dir)
    val inQuery = SimilarityOps.annTopKIvf(c, queriesOf(c), 10)
      .orderBy(col("query_id"), col("rank")).collect().toSeq
    val indexed = SimilarityOps.annTopKIvfIndexed(spark, dir, queriesOf(c), 10)
      .orderBy(col("query_id"), col("rank")).collect().toSeq
    assert(inQuery.nonEmpty && indexed == inQuery,
      s"persisted-index probe diverged from the in-query path " +
        s"(first mismatch: ${indexed.zip(inQuery).find(p => p._1 != p._2)})")

    // no-retrain: a second probe leaves every index file untouched
    def snapshot(): Map[String, Long] = {
      val root = new java.io.File(dir)
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles.toSeq.flatMap(walk) else Seq(f)
      walk(root).map(f => f.getPath -> f.lastModified()).toMap
    }
    val before = snapshot()
    val again = SimilarityOps.annTopKIvfIndexed(spark, dir, queriesOf(c), 10)
      .orderBy(col("query_id"), col("rank")).collect().toSeq
    assert(again == inQuery)
    assert(snapshot() == before, "re-probing mutated the persisted index")
  }

  test("probe partition-prunes the postings scan to the probed cids") {
    val dir = Files.createTempDirectory("graft_ivf_prune_").toString + "/index"
    val c = corpus()
    SimilarityOps.buildIvfIndex(c, dir)
    // one query, nprobe=2 of K=16: the scan must read 2 cluster dirs
    val oneQ = queriesOf(c).limit(1)
    val probe = SimilarityOps.annTopKIvfIndexed(spark, dir, oneQ, 10, nprobe = 2)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cid"),
      s"postings scan carries no cid partition filter:\n$plan")
    // the pruning is real: the scanned partition count is confined to 2
    // cid dirs (of the 16 the index holds)
    // sparkPlan, not executedPlan: AQE wraps the tree in an adaptive node
    // whose leaves are not the file scans
    val scannedParts = probe.queryExecution.sparkPlan.collectLeaves()
      .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("postings")) =>
        s.selectedPartitions.partitionCount }
    assert(scannedParts.nonEmpty && scannedParts.forall(_ <= 2),
      s"nprobe=2 probe scanned $scannedParts cluster dirs")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("registered q38 pins every parity leg to 10 and reuses the on-disk index") {
    val q38a = graft.SparkEntry.queries("q38_ann_ivf_indexed")(spark, sf)
      .collect().toSeq
    val q38b = graft.SparkEntry.queries("q38_ann_ivf_indexed")(spark, sf)
      .collect().toSeq
    assert(q38a.nonEmpty && q38b == q38a)
    // n_idx / n_exh / n_agree all 10: the standing index stores exactly
    // the corpus (exhaustive storage probe == independent-quantizer
    // in-query exhaustive probe) and the pruned probe returns full top-k
    for (r <- q38a; i <- 1 to 3)
      assert(r.getLong(i) == 10,
        s"standing-index parity divergence at query ${r.getLong(0)}: $r")
  }

  test("q49: the LSM (base + unfolded deltas) probe agrees exactly with the monolithic probe") {
    val rows = graft.SparkEntry.queries("q49_ivf_stream_parity")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    // every query: 10 rows each path, all 10 agreeing on (rank, vec_id) —
    // the delta storage path is invisible to probe results, before AND
    // after the fold (columns 4-6 probe the folded twin)
    for (r <- rows; i <- 1 to 6)
      assert(r.getLong(i) == 10,
        s"LSM/monolithic divergence at query ${r.getLong(0)}: $r")
    val root = sys.props("java.io.tmpdir") +
      "/graft_ivf_lsm_" + sf.replaceAll("[^A-Za-z0-9]", "_")
    val idx = new java.io.File(root).listFiles
      .filter(_.getName.matches("ivf-[0-9a-f]{16}")).head
    // the unfolded leg actually probed a delta-holding index (2 live
    // deltas) and the folded twin actually folded them away
    assert(SimilarityOps.unfoldedDeltaCount(spark, s"$idx/unfolded") == 2,
      "q49 unfolded state holds no deltas — the parity would be vacuous")
    assert(SimilarityOps.unfoldedDeltaCount(spark, s"$idx/folded") == 0,
      "q49 folded state still holds deltas — the fold leg is vacuous")
  }

  test("clusterSizes answers from footer statistics: COUNT pushed into the parquet scan") {
    val dir = Files.createTempDirectory("graft_ivf_footer_").toString + "/index"
    val c = corpus()
    SimilarityOps.buildIvfIndex(c, dir)
    // correctness first: the pushdown path agrees with a plain scan
    val sizes = SimilarityOps.clusterSizes(spark, dir)
    val plain = spark.read.parquet(s"$dir/postings").groupBy(col("cid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes == plain && sizes.values.sum == c.count())
    // plan shape: the grouped COUNT is PUSHED (row-group metadata, no
    // column data decoded) — pinned because the pushdown degrades
    // silently if the read shape stops qualifying
    graft.sources.FooterStats.withAggregatePushdown(spark) { s =>
      val df = s.read.parquet(s"$dir/postings")
        .groupBy(col("cid")).agg(count(lit(1)).as("n"))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregation") && plan.contains("COUNT"),
        s"grouped COUNT not pushed to the scan:\n$plan")
      assert(plan.contains("PushedGroupBy") && plan.contains("cid"),
        s"partition-column group-by not pushed:\n$plan")
    }
    // and the CALLER's session was never touched (isolated child session
    // — the data path stays V1 even while a maintenance read is in flight)
    assert(spark.conf.get("spark.sql.sources.useV1SourceList").contains("parquet"))
    assert(spark.conf.get("spark.sql.parquet.aggregatePushdown") == "false")
  }

  test("publish is atomic: a COLD torn tmp is swept, a HOT concurrent tmp survives") {
    val dir = Files.createTempDirectory("graft_ivf_torn_").toString + "/index"
    val c = corpus()
    // fabricate a crashed build gone cold: a stale unique-suffixed tmp dir
    val torn = new java.io.File(dir + ".tmp-dead/centroids")
    assert(torn.mkdirs())
    Files.writeString(torn.toPath.resolve("garbage"), "not parquet")
    val cold = System.currentTimeMillis() - SimilarityOps.TmpSweepAgeMs - 60000L
    assert(new java.io.File(dir + ".tmp-dead").setLastModified(cold))
    // ...and a HOT tmp — a concurrent builder mid-write; sweeping it would
    // kill that build's parquet job mid-flight instead of letting it lose
    // the publish race benignly
    val hot = new java.io.File(dir + ".tmp-hot")
    assert(hot.mkdirs())
    intercept[Exception] { // torn build is not loadable as an index
      SimilarityOps.loadIvfCentroids(spark, dir)
    }
    SimilarityOps.buildIvfIndex(c, dir)
    val leftovers = new java.io.File(dir).getParentFile.listFiles
      .map(_.getName).filter(_.startsWith("index.tmp-")).toSeq
    assert(leftovers == Seq("index.tmp-hot"),
      s"expected only the hot tmp to survive the publish: $leftovers")
    val k = SimilarityOps.loadIvfCentroids(spark, dir).length
    assert(k == 16, s"rebuilt index has $k centroids")
    // no retired `.old-` residue after a successful publish either
    assert(!new java.io.File(dir).getParentFile.listFiles
      .exists(_.getName.startsWith("index.old-")))
  }

  test("a rebuild over a live index retires it aside — probers never see an empty path") {
    val dir = Files.createTempDirectory("graft_ivf_retire_").toString + "/index"
    val c = corpus()
    SimilarityOps.buildIvfIndex(c, dir)
    val before = SimilarityOps.loadIvfCentroids(spark, dir)
    // in-place rebuild (the refreshIvfIndex retrain path): must promote via
    // retire-then-rename, never delete-then-rename
    SimilarityOps.buildIvfIndex(c, dir, lloydIters = 1)
    val after = SimilarityOps.loadIvfCentroids(spark, dir)
    assert(before.length == after.length)
    // the retired generation was cleaned up after the promote
    assert(!new java.io.File(dir).getParentFile.listFiles
      .exists(_.getName.startsWith("index.old-")), "retired dir leaked")
  }

  test("index cache keys by corpus content, not mtime: a backdated rewrite still re-keys") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_ivf_fp_").toString
    val dataDir = s"$base/data"
    def writeCorpus(ids: Range): Unit =
      ids.map(i => (i.toLong,
        // i+7 offset: i=0 would otherwise make a zero vector (norm 0)
        Array.tabulate(64)(j => math.sin((i + 7) * (j + 1) * 0.1).toFloat).toSeq))
        .toDF("vec_id", "embedding")
        .coalesce(1).write.mode("overwrite").parquet(s"$dataDir/embeddings.parquet")
    writeCorpus(0 until 200)
    val r1 = SimilarityOps.q38AnnIvfIndexed(spark, dataDir).collect()
    assert(r1.nonEmpty && r1.map(_.getLong(0)).forall(_ < 200L))
    // rewrite with DIFFERENT content, then force every corpus mtime BEHIND
    // the published index: the old mtime staleness check would serve the
    // stale index; the content fingerprint re-keys on part names/lengths
    writeCorpus(1000 until 1200)
    val old = System.currentTimeMillis() - 7L * 24 * 3600 * 1000
    def backdate(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(backdate)
      f.setLastModified(old); ()
    }
    backdate(new java.io.File(s"$dataDir/embeddings.parquet"))
    val r2 = SimilarityOps.q38AnnIvfIndexed(spark, dataDir).collect()
    val qids = r2.map(_.getLong(0)).toSet
    assert(qids.nonEmpty && qids.forall(_ >= 1000L),
      s"stale index served after backdated rewrite: query ids $qids")
    // and the same corpus state twice yields one generation (no rebuild):
    // superseded generations were swept, the live one remains
    val gens = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_ivf_" + dataDir.replaceAll("[^A-Za-z0-9]", "_")).listFiles
      .map(_.getName).filter(_.startsWith("ivf-")).toSeq
    assert(gens.size == 1, s"generation GC left: $gens")
  }

  test("appended vectors are findable without rebuild; growth triggers retrain") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ivf_append_").toString + "/index"
    val rnd = new scala.util.Random(44)
    val centers = Array.fill(16)(Array.fill(64)(rnd.nextGaussian()))
    def cluster(cl: Int, n: Int, idBase: Long) =
      (0 until n).map(i => (idBase + i,
        centers(cl).map(x => x + rnd.nextGaussian() * 0.05).toSeq))
    val baseRows = (0 until 14).flatMap(cl => cluster(cl, 50, cl * 50L))
    SimilarityOps.buildIvfIndex(baseRows.toDF("vec_id", "v"), dir, nClusters = 14)
    // vectors from two clusters the quantizer never saw
    val newRows = cluster(14, 15, 5000L) ++ cluster(15, 15, 6000L)
    def centroidSnapshot() = new java.io.File(s"$dir/centroids").listFiles
      .map(f => f.getName -> f.lastModified()).toMap
    val before = centroidSnapshot()
    SimilarityOps.appendToIvfIndex(newRows.toDF("vec_id", "v"), dir)
    assert(centroidSnapshot() == before, "append retrained/rewrote the centroids")
    // queries sitting on the appended clusters must find the appended
    // vectors through the standing index — no rebuild happened
    val q = (cluster(14, 2, 9000L) ++ cluster(15, 2, 9100L)).toDF("query_id", "qv")
    val got = SimilarityOps.annTopKIvfIndexed(spark, dir, q, 10, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val brute = SimilarityOps.bruteForceTopK(
      (baseRows ++ newRows).toDF("vec_id", "v"), q, 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(brute.nonEmpty)
    val recall = (brute intersect got).size.toDouble / brute.size
    assert(recall >= 0.9, s"appended vectors not findable: recall=$recall")
    assert(got.exists(_._2 >= 5000L), "no appended vector surfaced in top-k")
    // modest growth: no flag. Bulk growth (3.4x the build size): flag fires,
    // a rebuild over the grown corpus resets it.
    assert(!SimilarityOps.needsRetrain(spark, dir),
      "retrain flagged after a modest append")
    val bulk = (0 until 16).flatMap(cl => cluster(cl, 150, 10000L + cl * 1000L))
    SimilarityOps.appendToIvfIndex(bulk.toDF("vec_id", "v"), dir)
    assert(SimilarityOps.needsRetrain(spark, dir),
      "3x growth did not trigger the retrain flag")
    val grown = (baseRows ++ newRows ++ bulk).toDF("vec_id", "v")
    SimilarityOps.buildIvfIndex(grown, dir, nClusters = 16)
    assert(!SimilarityOps.needsRetrain(spark, dir),
      "rebuild did not reset the growth baseline")
  }

  test("refreshIvfIndex appends on the common path and rebuilds on growth") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ivf_refresh_").toString + "/index"
    val rnd = new scala.util.Random(45)
    val centers = Array.fill(8)(Array.fill(64)(rnd.nextGaussian()))
    def cluster(cl: Int, n: Int, idBase: Long) =
      (0 until n).map(i => (idBase + i,
        centers(cl).map(x => x + rnd.nextGaussian() * 0.05).toSeq))
    var corpus = (0 until 8).flatMap(cl => cluster(cl, 40, cl * 100L))
    SimilarityOps.buildIvfIndex(corpus.toDF("vec_id", "v"), dir, nClusters = 8)
    // small arrival: append only (no rebuild), new vectors probe-visible
    val small = cluster(3, 10, 9000L)
    corpus = corpus ++ small
    assert(!SimilarityOps.refreshIvfIndex(
      corpus.toDF("vec_id", "v"), small.toDF("vec_id", "v"), dir))
    val q = cluster(3, 1, 9900L).toDF("query_id", "qv")
    val got = SimilarityOps.annTopKIvfIndexed(spark, dir, q, 10, nprobe = 3)
      .collect().map(_.getLong(2)).toSet
    assert(got.exists(_ >= 9000L), "appended vector not probe-visible after refresh")
    // bulk arrival: growth trips the policy and the rebuild resets it
    val bulk = (0 until 8).flatMap(cl => cluster(cl, 120, 20000L + cl * 1000L))
    corpus = corpus ++ bulk
    assert(SimilarityOps.refreshIvfIndex(
      corpus.toDF("vec_id", "v"), bulk.toDF("vec_id", "v"), dir))
    assert(!SimilarityOps.needsRetrain(spark, dir))
    // the rebuilt index covers the full corpus, not just the appended
    // tail, and KEEPS the original quantizer shape (k=8, not the default)
    assert(SimilarityOps.clusterSizes(spark, dir).values.sum == corpus.size)
    assert(SimilarityOps.loadIvfCentroids(spark, dir).length == 8,
      "maintenance rebuild changed the cluster count")
  }
}
