package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Watermark-bounded streaming dedup: within-window duplicates collapse to
  * the first occurrence; the sink matches the batch first-per-hash
  * reference when every duplicate lands inside the window.
  */
class StreamDedupSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("within-watermark duplicates collapse; sink == batch first-per-hash") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_sdedup_").toString
    // payload "a" arrives 3x within minutes (replay storm), "b" twice,
    // "c" once — batch #2 also re-delivers an old "a" INSIDE the window
    val mk = (id: Long, minute: Int, props: String) =>
      (id, java.sql.Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00"), id % 7, "click", 1.0, props)
    Seq(mk(1, 0, "a"), mk(2, 1, "a"), mk(3, 2, "b"), mk(4, 3, "c"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$base/feed/f0")
    Seq(mk(5, 4, "a"), mk(6, 5, "b"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$base/feed/f1")

    val q = StreamDedup.run(spark, s"$base/feed/f*", s"$base/ckpt", s"$base/sink",
      watermark = "1 hour", maxFilesPerTrigger = 1)
    q.awaitTermination(120000L)
    assert(!q.isActive)

    val streamed = spark.read.parquet(s"$base/sink")
      .select("content_hash", "event_id", "ts", "props")
    val batch = StreamDedup.batchDedup(
      spark.read.parquet(s"$base/feed/f0", s"$base/feed/f1"))
    assert(streamed.count() == 3, // a, b, c — one each
      streamed.collect().mkString(", "))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "streaming dedup sink != batch first-per-hash reference")
  }

  test("native stateful ops (session_window, dedup-within-watermark) survive RocksDB") {
    // the provider-agnostic test in StreamingParitySpec covers the custom
    // flatMapGroupsWithState path; the BUILTIN stateful operators manage
    // their own state rows and must be proven against RocksDB too
    val base = Files.createTempDirectory("graft_rocks2_").toString
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    events.coalesce(1).write.parquet(s"$base/feed")
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val qd = StreamDedup.run(spark, s"$base/feed", s"$base/ckpt_d", s"$base/sink_d",
        watermark = "1 hour", maxFilesPerTrigger = 64)
      val qs = EventWindows.runSessions(spark, s"$base/feed", s"$base/ckpt_s", s"$base/sink_s",
        gapDur = "1 hour", watermark = "30 minutes", maxFilesPerTrigger = 64)
      qd.awaitTermination(120000L)
      qs.awaitTermination(120000L)
      assert(!qd.isActive && !qs.isActive)
    } finally {
      prev match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
    // dedup parity: every event payload is unique in this corpus, so the
    // sink must carry every row (and prove no state-store row loss)
    val dedup = spark.read.parquet(s"$base/sink_d")
    assert(dedup.count() == StreamDedup.batchDedup(events).count())
    // session parity: watermark-closed sessions equal the batch form
    val maxTs = events.agg(max(col("ts"))).head.getTimestamp(0)
    val cutoff = new java.sql.Timestamp(maxTs.getTime - 30 * 60 * 1000)
    val sessBatch = EventWindows.sessionStats(EventWindows.normalizeSess(events), "1 hour")
      .filter(col("session_end") <= lit(cutoff))
    val sessStream = spark.read.parquet(s"$base/sink_s")
      .select("user_id", "session_start", "session_end", "n_events")
    assert(sessStream.count() > 0)
    assert(sessStream.exceptAll(sessBatch).isEmpty && sessBatch.exceptAll(sessStream).isEmpty,
      "RocksDB-backed session stream diverged from batch session_window")
  }
}
