package graft.streaming

import graft.SparkTestSession
import graft.functions.HllSketch
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Continuous cardinality: the portable HLL aggregate under a Structured
  * Streaming aggregation — the standing distinct-count shape (unique
  * users per tenant, unique documents per source) with ONE 256-byte
  * state row per group, where exact streaming distinct would grow state
  * with every new value forever. Because the sketch is a pure max-merge,
  * the streamed result must be BIT-IDENTICAL to the batch sketch of the
  * same rows — stronger than the usual estimate-quality claim.
  */
class StreamHllSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("streaming HLL over 3 micro-batches == batch sketch, one state row per group") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_shll_").toString
    // overlapping values across batches: merge must dedupe by construction
    val rows = (1L to 600L).map(id => (id % 3, s"u${id % 157}"))
    rows.grouped(200).zipWithIndex.foreach { case (chunk, i) =>
      chunk.toDF("g", "v").coalesce(1).write.parquet(s"$base/feed/f$i")
    }

    val q = spark.readStream
      .schema("g LONG, v STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$base/feed/f*")
      .groupBy(col("g"))
      .agg(HllSketch(col("v")).as("regs"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("shll")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000L)
    assert(!q.isActive)

    val streamed = spark.table("shll")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val batch = rows.toDF("g", "v").groupBy(col("g"))
      .agg(HllSketch(col("v")).as("regs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(streamed == batch)

    val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    assert(stateRows == 3L, s"expected one state row per group, got $stateRows")
  }

  test("streaming Count-Min over 3 micro-batches == batch sketch") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_scms_").toString
    val rows = (1L to 600L).map(id => (id % 3, s"t${id % 89}"))
    rows.grouped(200).zipWithIndex.foreach { case (chunk, i) =>
      chunk.toDF("g", "v").coalesce(1).write.parquet(s"$base/feed/f$i")
    }
    val q = spark.readStream
      .schema("g LONG, v STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$base/feed/f*")
      .groupBy(col("g"))
      .agg(graft.functions.CmsSketch(col("v")).as("regs"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("scms")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000L)
    assert(!q.isActive)
    val streamed = spark.table("scms")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val batch = rows.toDF("g", "v").groupBy(col("g"))
      .agg(graft.functions.CmsSketch(col("v")).as("regs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(streamed == batch)
  }
}
