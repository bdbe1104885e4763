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
}
