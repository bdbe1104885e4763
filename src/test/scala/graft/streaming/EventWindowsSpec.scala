package graft.streaming

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Watermarked windowed aggregation: the streamed, finalized windows must
  * equal the batch aggregation restricted to windows the watermark closed
  * (append-mode's contract), and late rows beyond the watermark must not
  * resurrect closed windows.
  */
class EventWindowsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("streamed finalized windows == batch windows closed by the watermark") {
    val base = Files.createTempDirectory("graft_windows_").toString
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    // two time-ordered chunks so the watermark advances between batches
    val ranked = events.withColumn("rnk", row_number().over(
      org.apache.spark.sql.expressions.Window.orderBy(col("ts"), col("event_id"))))
    val n = events.count()
    ranked.filter(col("rnk") <= n / 2).drop("rnk")
      .coalesce(1).write.parquet(s"$base/feed/f0")
    ranked.filter(col("rnk") > n / 2).drop("rnk")
      .coalesce(1).write.parquet(s"$base/feed/f1")

    val q = EventWindows.run(spark, s"$base/feed/f*", s"$base/ckpt", s"$base/sink",
      windowDur = "1 hour", watermark = "30 minutes")
    q.awaitTermination(120000L)
    assert(!q.isActive)

    val streamed = spark.read.parquet(s"$base/sink")
      .select("window_start", "window_end", "event_type", "n_events", "sum_value")
    // batch truth, restricted to windows whose end precedes the final
    // watermark (max event time - 30 min)
    val maxTs = events.agg(max(col("ts"))).head.getTimestamp(0)
    val cutoff = new java.sql.Timestamp(maxTs.getTime - 30 * 60 * 1000)
    val batch = EventWindows.windowedStats(EventWindows.normalizeTs(events), "1 hour")
      .filter(col("window_end") <= lit(cutoff))
    assert(streamed.count() > 0, "no windows finalized — watermark never advanced")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      s"windowed parity mismatch: streamed=${streamed.count()} batch=${batch.count()}")
  }

  test("streamed finalized sessions == batch session_window closed by the watermark") {
    val base = Files.createTempDirectory("graft_sessions_").toString
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val ranked = events.withColumn("rnk", row_number().over(
      org.apache.spark.sql.expressions.Window.orderBy(col("ts"), col("event_id"))))
    val n = events.count()
    ranked.filter(col("rnk") <= n / 2).drop("rnk")
      .coalesce(1).write.parquet(s"$base/feed/f0")
    ranked.filter(col("rnk") > n / 2).drop("rnk")
      .coalesce(1).write.parquet(s"$base/feed/f1")

    // a short gap so plenty of sessions CLOSE inside the corpus timespan
    val q = EventWindows.runSessions(spark, s"$base/feed/f*", s"$base/ckpt", s"$base/sink",
      gapDur = "1 hour", watermark = "30 minutes")
    q.awaitTermination(120000L)
    assert(!q.isActive)

    val streamed = spark.read.parquet(s"$base/sink")
      .select("user_id", "session_start", "session_end", "n_events")
    val maxTs = events.agg(max(col("ts"))).head.getTimestamp(0)
    val cutoff = new java.sql.Timestamp(maxTs.getTime - 30 * 60 * 1000)
    val batch = EventWindows.sessionStats(EventWindows.normalizeSess(events), "1 hour")
      .filter(col("session_end") <= lit(cutoff))
    assert(streamed.count() > 0, "no sessions finalized — watermark never advanced")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      s"session parity mismatch: streamed=${streamed.count()} batch=${batch.count()}")
  }

}
