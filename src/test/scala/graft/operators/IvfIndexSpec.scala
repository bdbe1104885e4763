package graft.operators

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Persisted IVF index (VERDICT r6 item 3): build once, probe many times.
  * Gates for the rows-only q38: exact equality with q32's in-query path,
  * a no-retrain proof (second probe touches no index file), and the
  * partition-pruning plan assertion (the probe reads only probed cid dirs).
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

  test("registered q38 matches q32 exactly and reuses the on-disk index") {
    val q32 = graft.SparkEntry.queries("q32_ann_ivf")(spark, sf)
      .collect().toSeq
    val q38a = graft.SparkEntry.queries("q38_ann_ivf_indexed")(spark, sf)
      .collect().toSeq
    val q38b = graft.SparkEntry.queries("q38_ann_ivf_indexed")(spark, sf)
      .collect().toSeq
    assert(q32.nonEmpty && q38a == q32 && q38b == q32)
  }

  test("publish is atomic: a torn .tmp build is invisible and a rebuild replaces it") {
    val dir = Files.createTempDirectory("graft_ivf_torn_").toString + "/index"
    val c = corpus()
    // fabricate a crashed build: only the .tmp dir exists
    val torn = new java.io.File(dir + ".tmp/centroids")
    assert(torn.mkdirs())
    Files.writeString(torn.toPath.resolve("garbage"), "not parquet")
    intercept[Exception] { // torn build is not loadable as an index
      SimilarityOps.loadIvfCentroids(spark, dir)
    }
    SimilarityOps.buildIvfIndex(c, dir)
    assert(!new java.io.File(dir + ".tmp").exists(), ".tmp survived the publish")
    val k = SimilarityOps.loadIvfCentroids(spark, dir).length
    assert(k == 16, s"rebuilt index has $k centroids")
  }
}
