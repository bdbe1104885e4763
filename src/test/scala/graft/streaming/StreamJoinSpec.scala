package graft.streaming

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Stream-stream interval join: the streamed attribution matches must
  * equal the batch join over the same events — inner joins emit on match,
  * so a drained bounded run yields full parity (the watermark only
  * bounds STATE, and the in-order feed keeps every match reachable).
  */
class StreamJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("streamed interval join (2 micro-batches) == batch attribution join") {
    val base = Files.createTempDirectory("graft_sjoin_").toString
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val ranked = events.withColumn("rnk", row_number().over(
      org.apache.spark.sql.expressions.Window.orderBy(col("ts"), col("event_id"))))
    val n = events.count()
    ranked.filter(col("rnk") <= n / 2).drop("rnk")
      .coalesce(1).write.parquet(s"$base/feed/f0")
    ranked.filter(col("rnk") > n / 2).drop("rnk")
      .coalesce(1).write.parquet(s"$base/feed/f1")

    // a day-long window so the sparse corpus yields plenty of matches
    val q = StreamJoin.run(spark, s"$base/feed/f*", s"$base/ckpt", s"$base/sink",
      windowSec = 86400, watermark = "30 minutes")
    q.awaitTermination(120000L)
    assert(!q.isActive)

    val streamed = spark.read.parquet(s"$base/sink")
      .select("user_id", "p_event_id", "p_ts", "c_event_id", "c_ts")
    val batch = StreamJoin.batchAttribution(events, 86400)
    assert(streamed.count() > 0, "no attribution matches streamed")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      s"interval-join parity mismatch: streamed=${streamed.count()} batch=${batch.count()}")
  }
}
