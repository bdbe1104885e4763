package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Streaming SCD2: an in-order feed reconstructs exactly the batch q100
  * dimension; runs spanning micro-batch boundaries do NOT close at the
  * boundary; closed versions are append-once immutable.
  */
class StreamScd2Spec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("in-order feed reconstructs the batch q100 dimension exactly") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_sscd2_").toString
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("t"), col("event_id"))
      .orderBy(col("t"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    ev.grouped(math.max(ev.length / 3, 1)).zipWithIndex.foreach { case (chunk, i) =>
      chunk.toSeq.toDF("user_id", "event_type", "t", "event_id")
        .select(col("user_id"), col("event_type"),
          timestamp_micros(col("t")).as("ts"), col("event_id"))
        .coalesce(1).write.parquet(s"$base/feed/f$i")
      val d = new java.io.File(s"$base/feed/f$i")
      (d +: d.listFiles.toSeq).foreach(_.setLastModified(1700000000000L + i * 60000L))
    }
    val q = StreamScd2.run(spark, s"$base/feed/f*", s"$base/ckpt", s"$base/dim")
    q.awaitTermination(120000L)
    assert(!q.isActive, "stream did not drain")

    def canon(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), Option(r.get(4)))).toSet
    val got = canon(StreamScd2.readDimension(spark, s"$base/dim"))
    val want = canon(graft.operators.TimeSeriesOps.q100Scd2(spark, sf))
    assert(want.nonEmpty && got == want,
      s"dimension diverged: stream-only=${(got -- want).take(3)} " +
        s"batch-only=${(want -- got).take(3)}")
  }

  test("runs crossing batch boundaries stay open; closed rows append once") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_sscd2_b_").toString
    // user 1: A in batch 0, A again in batch 1 (same run!), B in batch 2
    val batches = Seq(
      Seq((1L, "A", 10L, 1L)),
      Seq((1L, "A", 20L, 2L)),
      Seq((1L, "B", 30L, 3L)))
    batches.zipWithIndex.foreach { case (chunk, i) =>
      chunk.toDF("user_id", "event_type", "t", "event_id")
        .select(col("user_id"), col("event_type"),
          timestamp_micros(col("t")).as("ts"), col("event_id"))
        .coalesce(1).write.parquet(s"$base/feed/f$i")
      val d = new java.io.File(s"$base/feed/f$i")
      (d +: d.listFiles.toSeq).foreach(_.setLastModified(1700000000000L + i * 60000L))
    }
    val q = StreamScd2.run(spark, s"$base/feed/f*", s"$base/ckpt", s"$base/dim")
    q.awaitTermination(120000L)
    assert(!q.isActive)
    val dim = StreamScd2.readDimension(spark, s"$base/dim")
      .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(3), Option(r.get(4))))
      .sortBy(_._1)
    // one A version [10, 30) — NOT split at the batch boundary — then open B
    assert(dim.toSeq == Seq((1L, "A", 10L, Some(30L)), (2L, "B", 30L, None)),
      dim.toSeq.toString)
    // the closed A row was appended exactly once across all generations
    val closedRows = spark.read.parquet(s"$base/dim")
      .where(!col("open")).count()
    assert(closedRows == 1L, s"closed rows duplicated: $closedRows")
  }
}
