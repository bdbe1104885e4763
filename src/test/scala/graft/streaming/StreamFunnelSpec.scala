package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The streaming ordered funnel: an in-order feed drains to exactly the
  * batch q95 result with one O(1) state row per user; stages advance
  * monotonically across micro-batches and never retract.
  */
class StreamFunnelSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("in-order feed drains to the batch q95 funnel exactly") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_sfunnel_").toString
    // three event-time-ordered chunks: arrival order == event-time order,
    // the regime where online == batch is the contract
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
    val q = StreamFunnel.run(spark, s"$base/feed/f*", s"$base/ckpt", s"$base/funnel")
    q.awaitTermination(120000L)
    assert(!q.isActive, "stream did not drain")

    val got = StreamFunnel.readFunnel(spark, s"$base/funnel")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)),
        Option(r.get(3)), r.getInt(4))).toSet
    val want = graft.operators.TimeSeriesOps.q95Funnel(spark, sf)
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)),
        Option(r.get(3)), r.getInt(4))).toSet
    assert(want.nonEmpty && got == want,
      s"streamed funnel diverged: stream-only=${(got -- want).take(3)} " +
        s"batch-only=${(want -- got).take(3)}")

    // O(1) state per user: state rows stay in the order of the USER
    // count, regardless of how many events streamed through (1000 here).
    // flatMapGroupsWithState's numRowsTotal over-reports relative to the
    // plain aggregate operators (format bookkeeping), so the pin is a
    // small multiple, not equality — the point is rows ≉ events.
    val users = ev.map(_._1).distinct.length
    val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    assert(stateRows <= 2L * users && stateRows >= users.toLong,
      s"expected ~$users state rows (one per user), got $stateRows")
  }

  test("stages never retract across batches; late pre-signup click is the online trade") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_sfunnel_mono_").toString
    // batch 0: signup@100, click@200 -> stage 2
    // batch 1: a LATE click@150 (after signup, before recorded click):
    //   state keeps the first-arrived click (no retraction), stage stays 2
    // batch 2: purchase@250 -> stage 3 (t_click still 200)
    val batches = Seq(
      Seq((1L, "signup", 100L, 1L), (1L, "click", 200L, 2L)),
      Seq((1L, "click", 150L, 3L)),
      Seq((1L, "purchase", 250L, 4L)))
    batches.zipWithIndex.foreach { case (chunk, i) =>
      chunk.toDF("user_id", "event_type", "t", "event_id")
        .select(col("user_id"), col("event_type"),
          timestamp_micros(col("t")).as("ts"), col("event_id"))
        .coalesce(1).write.parquet(s"$base/feed/f$i")
      val d = new java.io.File(s"$base/feed/f$i")
      (d +: d.listFiles.toSeq).foreach(_.setLastModified(1700000000000L + i * 60000L))
    }
    val q = StreamFunnel.run(spark, s"$base/feed/f*", s"$base/ckpt", s"$base/funnel")
    q.awaitTermination(120000L)
    assert(!q.isActive)
    val rows = spark.read.parquet(s"$base/funnel")
      .orderBy(col("batch_id"))
      .collect().map(r => (r.getAs[Long]("batch_id"), r.getAs[Int]("stage"),
        Option(r.getAs[Any]("t_click"))))
    // batch 0 recorded stage 2 with click@200; the late click batch
    // re-emits the UNCHANGED state (arrived events, no advance); purchase
    // completes stage 3 still anchored to click@200
    assert(rows.map(_._2).toSeq == Seq(2, 2, 3), rows.toSeq.toString)
    assert(rows.forall(_._3.contains(200L)), rows.toSeq.toString)
    val fin = StreamFunnel.readFunnel(spark, s"$base/funnel").collect()
    assert(fin.length == 1 && fin.head.getInt(4) == 3)
  }
}
