package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q90 bucketized interval join + q91 gap-fill/LOCF: semantic equivalence
  * to the naive encodings, hand-built boundary cases, and the plan pins
  * that prove the non-equi join never degrades to a nested-loop scan.
  */
class TimeSeriesOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("q90 equals the naive theta-join on sf0.001") {
    val ev = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), unix_micros(col("ts")).as("t"))
    val e = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("t").as("t0"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("t").as("tp"))
    val naive = e.join(p,
        col("tp") >= col("t0") && col("tp") < col("t0") + TimeSeriesOps.WindowUs,
        "left")
      .groupBy(col("event_id"))
      .agg(count(col("tp")).as("n_purchases"))
      .orderBy(col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val got = TimeSeriesOps.q90IntervalJoin(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == naive.toSeq)
    assert(got.nonEmpty && got.exists(_._2 > 0))
  }

  test("q90 boundary semantics: window is closed-open [t0, t0+W)") {
    import spark.implicits._
    val w = TimeSeriesOps.WindowUs
    // error at t=W exactly; purchases at W-1 (before), W (start, in),
    // 2W-1 (last inside), 2W (end, out). Bucket of the error is 1, so the
    // in-window purchases land in buckets 1 and... 2W-1 is bucket 1;
    // also one purchase deep in bucket 2 checks the b0+1 expansion:
    // t=W+W/2 -> wait, [W, 2W) spans buckets 1 only. Use error at t=W+W/2
    // instead: window [1.5W, 2.5W) spans buckets 1 and 2.
    val t0 = w + w / 2
    val ev = Seq(
      (1L, "error", t0),
      (10L, "purchase", t0 - 1), // before start -> out
      (11L, "purchase", t0), // closed start -> in (bucket 1)
      (12L, "purchase", 2 * w), // bucket 2 -> in
      (13L, "purchase", t0 + w - 1), // last micro inside (bucket 2)
      (14L, "purchase", t0 + w) // open end -> out
    ).toDF("event_id", "event_type", "t")
      .select(col("event_id"), col("event_type"),
        timestamp_micros(col("t")).as("ts"))
    val got = TimeSeriesOps.intervalJoinCounts(ev).collect()
    assert(got.length == 1)
    assert(got(0).getLong(0) == 1L && got(0).getLong(1) == 3L, got(0).toString)
  }

  test("q90 plan: shuffled equi-join, no cartesian / nested-loop") {
    val plan = SparkTestSession.finalPlan(TimeSeriesOps.q90IntervalJoin(spark, sf))
    val bad = plan.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(bad.isEmpty, s"non-equi fallback in q90 plan:\n$plan")
  }

  test("q91 grid is dense per user and LOCF carries the last observed max") {
    import spark.implicits._
    val h = 3600000000L
    // user 1: hours 0 (two events), 3 (one) -> grid 0..3, gaps 1,2 carry
    // hour-0 max 5.0; user 2: single hour, no gaps
    val ev = Seq(
      (1L, 0L, 5.0), (1L, h / 2, 3.0), (1L, 3 * h + 1, 7.0),
      (2L, 10 * h, 1.25)
    ).toDF("user_id", "t", "value")
      .select(col("user_id"), timestamp_micros(col("t")).as("ts"), col("value"))
    val got = TimeSeriesOps.gapFill(ev)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      (1L, 0L, 2L, false, 5.0),
      (1L, 1L, 0L, true, 5.0),
      (1L, 2L, 0L, true, 5.0),
      (1L, 3L, 1L, false, 7.0),
      (2L, 10L, 1L, false, 1.25)))
  }

  test("q95 funnel: steps gate on strict order, skipping a step stalls the stage") {
    import spark.implicits._
    val ev = Seq(
      // full conversion — but only via the ordered path: the click at 5
      // (before signup) and the purchase at 15 (before the counted click)
      // must not count
      (1L, "signup", 10L), (1L, "click", 5L), (1L, "click", 20L),
      (1L, "purchase", 15L), (1L, "purchase", 30L),
      // signup only
      (2L, "signup", 10L),
      // no signup at all -> not in the funnel
      (3L, "click", 10L), (3L, "purchase", 20L),
      // purchase without click -> still stage 1
      (4L, "signup", 10L), (4L, "purchase", 20L)
    ).toDF("user_id", "event_type", "t")
      .select(col("user_id"), col("event_type"), timestamp_micros(col("t")).as("ts"))
    val got = TimeSeriesOps.funnel(ev).collect()
      .map(r => (r.getLong(0),
        Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getInt(4)))
    assert(got.toSeq == Seq(
      (1L, Some(10L), Some(20L), Some(30L), 3),
      (2L, Some(10L), None, None, 1),
      (4L, Some(10L), None, None, 1)))
  }

  test("q96 cohort: offsets window to 7 days, one row per (cohort, offset)") {
    import spark.implicits._
    val day = 86400000000L
    val ev = Seq(
      (1L, 0L), (1L, day / 2), // day 0 twice -> one active day
      (1L, day), (1L, 9 * day), // offsets 1 and 9 (dropped)
      (2L, day), (2L, 3 * day)
    ).toDF("user_id", "t")
      .select(col("user_id"), timestamp_micros(col("t")).as("ts"))
    val got = TimeSeriesOps.cohortRetention(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (0L, 0L, 1L), (0L, 1L, 1L), (1L, 0L, 1L), (1L, 2L, 1L)))
  }

  test("q95/q96 plans: no window, no cartesian, no per-user event sort") {
    for (df <- Seq(
        TimeSeriesOps.q95Funnel(spark, sf),
        TimeSeriesOps.q96CohortRetention(spark, sf))) {
      val plan = SparkTestSession.finalPlan(df)
      val bad = plan.collect {
        case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
        case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(bad.isEmpty, s"window/cartesian in plan:\n$plan")
    }
  }

  test("q100 SCD2: runs coalesce, versions number, validity chains") {
    import spark.implicits._
    val ev = Seq(
      // user 1: A A B A -> versions A[10,30) B[30,40) A[40,null)
      (1L, "A", 10L, 1L), (1L, "A", 20L, 2L), (1L, "B", 30L, 3L),
      (1L, "A", 40L, 4L),
      // user 2: single state, two observations -> one open version
      (2L, "X", 5L, 5L), (2L, "X", 6L, 6L),
      // same-timestamp tie broken by event_id: B (7) then A (8)
      (3L, "B", 7L, 7L), (3L, "A", 7L, 8L)
    ).toDF("user_id", "event_type", "t", "event_id")
      .select(col("user_id"), col("event_type"),
        timestamp_micros(col("t")).as("ts"), col("event_id"))
    val got = TimeSeriesOps.scd2(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        Option(r.get(4))))
    assert(got.toSeq == Seq(
      (1L, 1L, "A", 10L, Some(30L)),
      (1L, 2L, "B", 30L, Some(40L)),
      (1L, 3L, "A", 40L, None),
      (2L, 1L, "X", 5L, None),
      (3L, 1L, "B", 7L, Some(7L)),
      (3L, 2L, "A", 7L, None)))
  }

  test("q100 on sf0.001: versions dense, validity contiguous, one open per user") {
    val out = TimeSeriesOps.q100Scd2(spark, sf).cache()
    try {
      val byUser = out.groupBy(col("user_id")).agg(
        count(lit(1)).as("n"),
        max(col("version")).as("maxv"),
        sum(when(col("valid_to").isNull, 1).otherwise(0)).as("open"))
        .collect()
      byUser.foreach { r =>
        assert(r.getLong(1) == r.getLong(2), s"versions not dense: $r")
        assert(r.getLong(3) == 1L, s"user needs exactly one open version: $r")
      }
      // each version's valid_to == the next version's valid_from
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("version"))
      val broken = out
        .withColumn("next_from", lead(col("valid_from"), 1).over(w))
        .where(col("next_from").isNotNull && col("valid_to") =!= col("next_from"))
      assert(broken.isEmpty, "validity chain broken")
    } finally { out.unpersist(); () }
  }

  test("q91 on sf0.001: totals preserved, grid contiguous, no null LOCF") {
    val out = TimeSeriesOps.q91GapFill(spark, sf).cache()
    try {
      val evTotal = graft.Tables.events(spark, sf).count()
      assert(out.agg(sum(col("n_events"))).head().getLong(0) == evTotal)
      // per user: rows == h1 - h0 + 1 (dense), and the first row is
      // observed (so value_locf is never null anywhere)
      val byUser = out.groupBy(col("user_id"))
        .agg(count(lit(1)).as("rows"),
          (max(col("hour")) - min(col("hour")) + 1).as("span"),
          min(struct(col("hour"), col("filled"))).as("first"),
          sum(when(col("value_locf").isNull, 1).otherwise(0)).as("nulls"))
        .collect()
      byUser.foreach { r =>
        assert(r.getLong(1) == r.getLong(2), s"sparse grid for user ${r.getLong(0)}")
        assert(!r.getStruct(3).getBoolean(1), s"first row filled for user ${r.getLong(0)}")
        assert(r.getLong(4) == 0L, s"null LOCF for user ${r.getLong(0)}")
      }
    } finally { out.unpersist(); () }
  }
}
