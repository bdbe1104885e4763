package graft.streaming

import graft.SparkTestSession
import graft.functions.BoundedTopK
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Continuous grouped top-k: the BoundedTopK native aggregate under a
  * Structured Streaming aggregation. The state store holds ONE row per
  * group whose value is the serialized k-heap — state is O(groups × k)
  * no matter how many rows stream through, which is the standing-leaderboard
  * shape (top documents per language, hottest keys per tenant) that would
  * otherwise need either an unbounded `collect_list` state or a re-sort of
  * the whole history each trigger.
  */
class StreamTopKSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("streaming top-k over 3 micro-batches == batch top-k; state is one row per group") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_stopk_").toString
    val rows = (1L to 300L).map(id => (id % 5, (id * 2654435761L) % 1000, id))
    rows.grouped(100).zipWithIndex.foreach { case (chunk, i) =>
      chunk.toDF("g", "score", "id").coalesce(1).write.parquet(s"$base/feed/f$i")
    }

    val stream = spark.readStream
      .schema("g LONG, score LONG, id LONG")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$base/feed/f*")
      .groupBy(col("g"))
      .agg(BoundedTopK(struct(col("score"), col("id")), 4).as("top"))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("stopk")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000L)
    assert(!q.isActive)

    val got = spark.table("stopk")
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), col("pos"), col("col.score"), col("col.id"))
      .as[(Long, Int, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(t => (t._3, t._4)).toSeq).toMap
    val expected = rows.groupBy(_._1).view.mapValues {
      _.map(t => (t._2, t._3)).sortBy(t => (-t._1, -t._2)).take(4).toSeq
    }.toMap
    assert(got == expected)

    // bounded state: exactly one state row per group, across all 3 batches
    val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    assert(stateRows == 5L, s"expected one state row per group, got $stateRows")
  }
}
