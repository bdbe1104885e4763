package graft.streaming

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** Port of the reference's end-to-end concurrent-ingestion scenario
  * (`CheckpointDaoTest.java:77-152`: a scheduled writer inserts checkpoint
  * batches while a reader polls the sink for progressive updates). Here a
  * live ProcessingTime stream consumes files dropped mid-flight and the
  * sink must advance — state growing monotonically — across batches.
  */
class StreamingCadenceSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("live stream absorbs files dropped while running; sink advances") {
    val base = Files.createTempDirectory("graft_cadence_").toString
    val srcDir = s"$base/feed"
    Files.createDirectories(Paths.get(srcDir))
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("ts"), col("event_id"))))
    val n = events.count()

    def drop(i: Int, lo: Long, hi: Long): Unit =
      events.filter(col("rnk").between(lo, hi)).drop("rnk")
        .coalesce(1).write.parquet(s"$srcDir/drop$i")

    // first chunk exists before start (the backfill)
    drop(0, 1, n / 4)
    val sink = s"$base/sink"
    val q = CheckpointStream.run(spark, s"$srcDir/drop*", s"$base/ckpt", sink,
      maxFilesPerTrigger = 1, availableNow = false)
    try {
      def sinkRows: Long =
        if (Files.exists(Paths.get(sink)))
          try spark.read.parquet(sink).count() catch { case _: Throwable => 0L }
        else 0L
      def waitFor(min: Long): Long = {
        val deadline = System.currentTimeMillis() + 60000
        var rows = sinkRows
        while (rows < min && System.currentTimeMillis() < deadline) {
          Thread.sleep(500); rows = sinkRows
        }
        rows
      }
      val afterBackfill = waitFor(1)
      assert(afterBackfill > 0, "backfill batch never reached the sink")

      // writer cadence: two more drops while the query is live
      drop(1, n / 4 + 1, n / 2)
      val afterSecond = waitFor(afterBackfill + 1)
      assert(afterSecond > afterBackfill, "sink did not advance after second drop")

      drop(2, n / 2 + 1, n)
      val afterThird = waitFor(afterSecond + 1)
      assert(afterThird > afterSecond, "sink did not advance after third drop")
    } finally q.stop()

    // final state equals the batch replay over everything delivered
    val streamed = spark.read.parquet(sink)
      .select("user_id", "task_id", "event_id", "ts_us", "payload", "seq")
    val batch = CheckpointStream.backfill(spark, events.drop("rnk")).toDF()
      .select("user_id", "task_id", "event_id", "ts_us", "payload", "seq")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }
}
