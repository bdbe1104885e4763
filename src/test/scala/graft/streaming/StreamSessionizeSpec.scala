package graft.streaming

import graft.SparkTestSession
import graft.operators.SessionOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The streaming gap-sessionization lane (round-13 stretch): drained
  * streaming sessions equal batch q33 EXACTLY (including q33's own
  * gap-boundary rule), the path derivation equals q110, and out-of-order
  * delivery within the watermark cannot change results.
  */
class StreamSessionizeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Write event chunks as feed files with deterministic arrival order,
    * appending a far-future sentinel event (user −1) that advances the
    * watermark past every real session's end + gap so they all finalize.
    */
  private def writeFeed(
      base: String,
      chunks: Seq[Seq[(Long, String, Long, Long)]],
      sentinelT: Long): Unit = {
    import spark.implicits._
    val all = chunks :+ Seq((-1L, "click", sentinelT, -1L))
    all.zipWithIndex.foreach { case (chunk, i) =>
      chunk.toDF("user_id", "event_type", "t", "event_id")
        .select(col("user_id"), col("event_type"),
          timestamp_micros(col("t")).as("ts"), col("event_id"))
        .coalesce(1).write.parquet(s"$base/feed/f$i")
      val d = new java.io.File(s"$base/feed/f$i")
      (d +: d.listFiles.toSeq).foreach(_.setLastModified(1700000000000L + i * 60000L))
    }
  }

  test("drained sf feed == batch q33 sessions exactly; paths == q110") {
    val base = Files.createTempDirectory("graft_ssess_").toString
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("t"), col("event_id"))
      .orderBy(col("t"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val maxT = ev.map(_._3).max
    writeFeed(base, ev.grouped(math.max(ev.length / 3, 1)).map(_.toSeq).toSeq,
      maxT + SessionOps.SessionGapUs + 3600L * 1000000L * 48L)
    val q = StreamSessionize.run(spark, s"$base/feed/f*", s"$base/ckpt",
      s"$base/sessions")
    q.awaitTermination(180000L)
    assert(!q.isActive, "stream did not drain")

    val got = StreamSessionize.readSessions(spark, s"$base/sessions")
      .filter(col("user_id") =!= -1L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // q33 columns: (user_id, session_no, n_events, start_us, end_us)
    val want = SessionOps.q33Sessionize(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(2)))
      .toSet
    assert(want.nonEmpty && got == want,
      s"sessions diverged: stream-only=${(got -- want).take(3)} " +
        s"batch-only=${(want -- got).take(3)}")

    // the derived paths equal batch q110 row-for-row (the sentinel's
    // 1-event session finalizes too but yields no 3-step path)
    val gotPaths = StreamSessionize.readSessionPaths(spark, s"$base/sessions")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val wantPaths = SessionOps.q110SessionPaths(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(wantPaths.nonEmpty && gotPaths == wantPaths,
      s"paths diverged:\nstream=$gotPaths\nbatch=$wantPaths")

    // association rules over the drained sessions equal batch q111 EXCEPT
    // for the sentinel's 1-type basket, which shifts n_baskets by one —
    // exclude it the way the session comparison does, by deriving rules
    // from the filtered sink
    val gotRules = graft.operators.SessionOps.associationRulesFrom(
      StreamSessionize.readSessions(spark, s"$base/sessions")
        .filter(col("user_id") =!= -1L)
        .select(col("user_id"), col("session_start_us").as("session_no"),
          explode(array_distinct(col("types"))).as("t"))
        .distinct())
      .collect().map(_.toString).sorted.toSeq
    val wantRules = SessionOps.q111AssociationRules(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(wantRules.nonEmpty && gotRules == wantRules,
      s"rules diverged:\nstream=${gotRules.take(3)}\nbatch=${wantRules.take(3)}")
  }

  test("out-of-order delivery within the watermark is order-free; types stay sorted") {
    val base = Files.createTempDirectory("graft_ssess_ooo_").toString
    val hr = 3600L * 1000000L
    // epoch offset: the initial watermark is 0, and the stateful
    // operator's late-row filter correctly drops events at/below it —
    // real event times are never at the epoch
    val t0 = 1700L * 1000000L * 1000000L
    // user 1: a 3-event session (h0 click, h1 view, h2 purchase) and a
    // second session at h30 (gap 28 h > 24 h); the middle event arrives
    // LAST, one chunk behind events that already passed its timestamp
    val chunks = Seq(
      Seq((1L, "click", t0, 10L), (1L, "purchase", t0 + 2 * hr, 12L)),
      Seq((1L, "view", t0 + 1 * hr, 11L), (1L, "click", t0 + 30 * hr, 13L)))
    writeFeed(base, chunks, t0 + 30 * hr + SessionOps.SessionGapUs + 96L * hr)
    val q = StreamSessionize.run(spark, s"$base/feed/f*", s"$base/ckpt",
      s"$base/sessions", watermark = "48 hours")
    q.awaitTermination(120000L)
    assert(!q.isActive)
    val got = StreamSessionize.readSessions(spark, s"$base/sessions")
      .filter(col("user_id") === 1L)
      .orderBy(col("session_start_us"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getSeq[String](4)))
    assert(got.toSeq == Seq(
      (t0, t0 + 2 * hr, 3L, Seq("click", "view", "purchase")),
      (t0 + 30 * hr, t0 + 30 * hr, 1L, Seq("click"))),
      s"out-of-order sessions wrong: ${got.mkString("; ")}")
  }

  test("state holds only the open tail; finalized sessions leave the store") {
    val base = Files.createTempDirectory("graft_ssess_state_").toString
    val hr = 3600L * 1000000L
    // 20 users, one early session each; a later chunk advances the
    // watermark far enough to finalize and evict all of them
    val users = (1L to 20L).map(u => (u, "click", u * 1000L, u)).toSeq
    writeFeed(base, Seq(users), 1000L * hr)
    val q = StreamSessionize.run(spark, s"$base/feed/f*", s"$base/ckpt",
      s"$base/sessions")
    q.awaitTermination(120000L)
    assert(!q.isActive)
    // all 20 real sessions finalized; only the sentinel's tail may remain
    assert(StreamSessionize.readSessions(spark, s"$base/sessions")
      .filter(col("user_id") =!= -1L).count() == 20)
    val lastState = q.recentProgress.toSeq
      .flatMap(p => Option(p.stateOperators).toSeq.flatten.map(_.numRowsTotal))
      .lastOption.getOrElse(0L)
    assert(lastState <= 1L, s"finalized sessions left state behind: $lastState")
  }
}
