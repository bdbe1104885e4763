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
    // spans two different micro-batches (its docs sit in different thirds)
    val bounds = Seq(n / 3, 2 * n / 3)
    def chunkOf(id: Long): Int = {
      val rnk = ranked.filter(col("doc_id") === id).select("rnk").head.getInt(0).toLong
      bounds.count(rnk > _)
    }
    assert(streamed.keySet.exists { case (a, b) => chunkOf(a) != chunkOf(b) },
      "no cross-batch pair was flagged — the standing index saw no use")

    // the index accumulated one replay-idempotent generation per batch
    for (part <- Seq("bands", "sets")) {
      val dirs = new java.io.File(s"$base/index/$part").listFiles
        .map(_.getName).filter(_.startsWith("batch_id=")).sorted.toSeq
      assert(dirs == Seq("batch_id=0", "batch_id=1", "batch_id=2"), s"$part: $dirs")
    }
  }
}
