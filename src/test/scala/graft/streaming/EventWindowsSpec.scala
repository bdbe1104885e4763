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

  test("sliding windows: every event lands in exactly size/slide windows") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val slid = EventWindows.slidingStats(
      EventWindows.normalizeTs(events), "1 hour", "15 minutes")
    // 4 overlapping windows per event: total n_events quadruples the rows
    val total = slid.agg(sum(col("n_events"))).head.getLong(0)
    assert(total == 4L * events.count(), s"expected 4x coverage, got $total")
    // every window is exactly 1 hour and starts on a 15-minute boundary
    val bad = slid.where(
      unix_micros(col("window_end")) - unix_micros(col("window_start"))
        =!= 3600000000L ||
        unix_micros(col("window_start")) % 900000000L =!= 0L)
    assert(bad.isEmpty, "window geometry broken")
    // the tumbling q29 is the slide == size special case of the same frame
    val tumble = EventWindows.slidingStats(
      EventWindows.normalizeTs(events), "1 hour", "1 hour")
    val q29 = EventWindows.windowedStats(EventWindows.normalizeTs(events), "1 hour")
    assert(tumble.exceptAll(q29).isEmpty && q29.exceptAll(tumble).isEmpty)
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
