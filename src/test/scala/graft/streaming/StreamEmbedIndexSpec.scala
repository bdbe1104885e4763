package graft.streaming

import graft.{SparkTestSession, Tables}
import graft.operators.SimilarityOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Streaming-fed standing ANN index: after 3 micro-batches the streamed
  * index (base from batch 0 + two delta generations) answers an
  * all-clusters probe IDENTICALLY to a batch-built index over the same
  * accumulated corpus (candidate set = everything on both sides, so the
  * quantizer difference cannot matter); folding compacts the deltas into
  * a retrained base without changing answers; the fold watermark protects
  * against double-counting.
  */
class StreamEmbedIndexSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private val K = 8

  test("3-batch streamed index == batch-built index under an all-clusters probe; fold keeps answers") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_sembed_").toString
    val emb = Tables.embeddings(spark, sf)
    val n = emb.count()
    val ranked = emb.withColumn("rnk", row_number().over(Window.orderBy(col("vec_id"))))
    for ((lo, hi, i) <- Seq(
        (1L, n / 3, 0), (n / 3 + 1, 2 * n / 3, 1), (2 * n / 3 + 1, n, 2)))
      ranked.filter(col("rnk").between(lo, hi)).drop("rnk")
        .coalesce(1).write.parquet(s"$base/feed/chunk=$i")

    val q = StreamEmbedIndex.run(spark, s"$base/feed/chunk=*", s"$base/ckpt",
      s"$base/index", nClusters = K)
    q.awaitTermination(180000L)
    assert(!q.isActive, "stream did not drain with AvailableNow")

    // base + two committed delta generations
    val deltaDirs = new java.io.File(s"$base/index/deltas").listFiles
      .map(_.getName).filter(_.startsWith("batch_id=")).sorted.toSeq
    assert(deltaDirs == Seq("batch_id=1", "batch_id=2"), deltaDirs.toString)

    val queries = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"),
        col("embedding").cast("array<double>").as("qv"))
    def probe(dir: String) =
      SimilarityOps.annTopKIvfIndexed(spark, dir, queries, 10, nprobe = K)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // batch-built reference index over the same accumulated corpus
    val corpus = emb.repartition(col("vec_id"))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    SimilarityOps.buildIvfIndex(corpus, s"$base/ref_index", K)
    val expected = probe(s"$base/ref_index")
    val streamed = probe(s"$base/index")
    assert(expected.nonEmpty && streamed == expected,
      s"streamed-index probe diverged: onlyStream=${(streamed -- expected).take(5)} " +
        s"onlyRef=${(expected -- streamed).take(5)}")

    // replay idempotence: re-appending a committed generation is a no-op
    val before = spark.read.parquet(s"$base/index/deltas").count()
    SimilarityOps.appendIvfDelta(
      corpus.limit(5), s"$base/index", 2L)
    assert(spark.read.parquet(s"$base/index/deltas").count() == before)

    // fold: deltas compact into a retrained base, answers unchanged
    assert(SimilarityOps.foldIvfDeltas(spark, s"$base/index"))
    // the retire-aside publish carries the folded deltas out with the old
    // base — the deltas dir may be gone entirely
    val leftover = Option(new java.io.File(s"$base/index/deltas").listFiles)
      .toSeq.flatten.map(_.getName).filter(_.startsWith("batch_id="))
    assert(leftover.isEmpty, s"fold left deltas: $leftover")
    assert(probe(s"$base/index") == expected, "fold changed probe answers")
    // a second fold with nothing to do is a no-op
    assert(!SimilarityOps.foldIvfDeltas(spark, s"$base/index"))

    // watermark protection: a ghost delta at or below the fold watermark
    // (a crashed fold's leftover) is ignored by probes and GC'd by the
    // next fold, never double-counted
    val ghostVecs = Seq((999999L, Array.fill(64)(1.0).toSeq))
      .toDF("vec_id", "v")
    SimilarityOps.appendIvfDelta(ghostVecs, s"$base/index", 1L)
    assert(!new java.io.File(s"$base/index/deltas/batch_id=1").exists,
      "watermarked batch id was re-admitted as a delta")
    // and a fresh checkpoint against the populated index is refused
    val ex = intercept[IllegalStateException] {
      StreamEmbedIndex.run(spark, s"$base/feed/chunk=*", s"$base/ckpt_fresh",
        s"$base/index", nClusters = K)
    }
    assert(ex.getMessage.contains("does not own"), ex.getMessage)
  }

  test("owner stamp closes the batch-0 data-loss window: one-batch index refuses a fresh checkpoint") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_sembed_own0_").toString
    Tables.embeddings(spark, sf).limit(64)
      .coalesce(1).write.parquet(s"$base/feed/chunk=0")
    val q = StreamEmbedIndex.run(spark, s"$base/feed/chunk=*", s"$base/ckpt",
      s"$base/index", nClusters = K)
    q.awaitTermination(120000L)
    assert(!q.isActive)
    // the index holds only the base, folded-through-0 — the window the
    // commit-lead check cannot see. Without the stamp, a fresh
    // checkpoint's batch 0 would sit AT the fold watermark and be
    // silently DROPPED (appendIvfDelta's `batchId <= foldedThrough`
    // no-op): data loss, not just wrong flags. The stamp refuses it.
    val ex = intercept[IllegalStateException] {
      StreamEmbedIndex.run(spark, s"$base/feed/chunk=*", s"$base/ckpt_fresh",
        s"$base/index", nClusters = K)
    }
    assert(ex.getMessage.contains("does not own"), ex.getMessage)
    // crash-replay from the true owner stays admitted, and the stamp
    // survives the base's rename-swap publish because it lives BESIDE
    // the index dir, not inside it
    val q2 = StreamEmbedIndex.run(spark, s"$base/feed/chunk=*", s"$base/ckpt",
      s"$base/index", nClusters = K)
    q2.awaitTermination(120000L)
    assert(!q2.isActive)
    assert(new java.io.File(s"$base/index._owner.json").exists,
      "owner stamp missing from the beside location")
    assert(!new java.io.File(s"$base/index/_owner.json").exists,
      "stamp leaked inside the rename-swapped index dir")
    // a changed quantizer shape is refused loudly, never silently ignored
    // (with an existing base the setting would otherwise have no effect)
    val exK = intercept[IllegalStateException] {
      StreamEmbedIndex.run(spark, s"$base/feed/chunk=*", s"$base/ckpt",
        s"$base/index", nClusters = K + 1)
    }
    assert(exK.getMessage.contains(s"trained with nClusters=$K"), exK.getMessage)
  }
}
