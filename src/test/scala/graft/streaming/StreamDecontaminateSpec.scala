package graft.streaming

import graft.{SparkTestSession, Tables}
import graft.operators.DedupOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Streaming ingest decontamination parity: flagging documents as they
  * arrive (3 micro-batches) must equal the batch q40 operator over the
  * same corpus — per-document semantics make batch-local == global, and
  * this test is what pins that equivalence.
  */
class StreamDecontaminateSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("streaming decontamination (3 micro-batches) == batch decontaminate") {
    val base = Files.createTempDirectory("graft_sdecon_").toString
    val docs = Tables.documents(spark, sf)
    val evalSet = docs.filter(col("doc_id") % 20 === 0)
    val train = docs.filter(col("doc_id") % 20 =!= 0)
    val nTot = train.count()
    val ranked = train.withColumn("rnk", row_number().over(Window.orderBy(col("doc_id"))))
    for ((lo, hi, i) <- Seq(
        (1L, nTot / 3, 0), (nTot / 3 + 1, 2 * nTot / 3, 1), (2 * nTot / 3 + 1, nTot, 2)))
      ranked.filter(col("rnk").between(lo, hi)).drop("rnk")
        .coalesce(1).write.parquet(s"$base/feed/chunk=$i")

    val q = StreamDecontaminate.run(
      spark, s"$base/feed/chunk=*", s"$base/ckpt", s"$base/sink", evalSet)
    q.awaitTermination(120000L)
    assert(!q.isActive, "stream did not drain with AvailableNow")

    val cols = Seq("doc_id", "n_shared", "keep")
    val streamed = spark.read.parquet(s"$base/sink").select(cols.map(col): _*)
    val batch = DedupOps.decontaminate(train, evalSet).select(cols.map(col): _*)
    assert(streamed.count() == nTot, "stream flagged a different document count")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "streaming flags diverged from the batch operator")
    // the corpus really contains contamination, so the guard did real work
    assert(streamed.filter(!col("keep")).count() > 0)
    // every micro-batch committed its own replay-idempotent partition dir
    val dirs = new java.io.File(s"$base/sink").listFiles
      .map(_.getName).filter(_.startsWith("batch_id=")).sorted.toSeq
    assert(dirs.size == 3, s"expected 3 batch dirs, got $dirs")

    // Bloom mode over the same feed: the blob is built once at query
    // start, every batch primes the two-phase operator — and the verdicts
    // are bit-identical to the broadcast-mode run above
    val qb = StreamDecontaminate.run(
      spark, s"$base/feed/chunk=*", s"$base/ckpt_bloom", s"$base/sink_bloom",
      evalSet, bloom = true)
    qb.awaitTermination(120000L)
    assert(!qb.isActive, "bloom stream did not drain with AvailableNow")
    val bloomed = spark.read.parquet(s"$base/sink_bloom").select(cols.map(col): _*)
    assert(bloomed.exceptAll(streamed).isEmpty && streamed.exceptAll(bloomed).isEmpty,
      "bloom-mode streaming flags diverged from broadcast mode")
  }
}
