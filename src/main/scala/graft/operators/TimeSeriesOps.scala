package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators over the `events` stream table: the non-equi
  * point-in-interval join and the gap-fill/LOCF resample — the two shapes a
  * monitoring/feature pipeline needs that plain groupBy/equi-join cannot
  * express directly (SURVEY §2.5 extensions; the reference's event lifecycle
  * is `CdcCheckpointDao`-driven and has no time-bucket analytics at all).
  *
  * Scale design: both operators avoid the naive O(|A|·|B|) plan. The
  * interval join BUCKETIZES time so Catalyst plans a plain shuffled
  * equi-join (no BroadcastNestedLoop / CartesianProduct — plan-pinned in
  * TimeSeriesOpsSpec); the gap-fill generates each key's missing buckets
  * with `sequence()` bounded by the corpus time span, so state per key is
  * O(span/bucket), never O(rows).
  */
object TimeSeriesOps {

  /** Interval width (and bucket size) for q90: 5 minutes in microseconds. */
  private[graft] val WindowUs = 300000000L

  /** q90: point-in-interval join WITHOUT an equi key — for every `error`
    * event, count the `purchase` events (from ANY user) that land inside
    * the 5-minute window `[error_ts, error_ts + 5min)`.
    *
    * The naive encoding is a pure theta-join (`p.ts BETWEEN e.ts AND
    * e.ts+W`), which Spark can only plan as BroadcastNestedLoopJoin — a
    * scan of every purchase for every error, quadratic at 100 TB. Because
    * the probe window width equals one bucket, an interval starting in
    * bucket `b` can only overlap purchases in buckets `b` or `b+1`:
    * exploding each error into those two bucket keys turns the theta-join
    * into a shuffled EQUI-join on `bucket` followed by an exact refine.
    * Each (error, purchase) pair can match at most once (a purchase owns
    * exactly one bucket), so no dedup step is needed. Join volume is
    * bounded by events-per-window density, not by |errors|·|purchases|.
    */
  def q90IntervalJoin(spark: SparkSession, dir: String): DataFrame =
    intervalJoinCounts(Tables.events(spark, dir))

  /** Core of q90 over any frame with (event_id, event_type, ts). */
  private[graft] def intervalJoinCounts(events: DataFrame): DataFrame = {
    // `div` (integral division) keeps bucketing exact; a double `/` then
    // cast could mis-bucket a boundary timestamp at large epochs
    val ev = events
      .select(col("event_id"), col("event_type"), unix_micros(col("ts")).as("t"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("t").as("t0"),
        expr(s"t div ${WindowUs}L").as("b0"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("t").as("tp"), expr(s"t div ${WindowUs}L").as("bucket"))
    val matched = errors
      .select(col("event_id"), col("t0"),
        explode(array(col("b0"), col("b0") + 1)).as("bucket"))
      .join(purchases, Seq("bucket"))
      .where(col("tp") >= col("t0") && col("tp") < col("t0") + WindowUs)
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_purchases"))
    // left join back so zero-overlap errors keep a row (the oracle's LEFT
    // JOIN ... GROUP BY shape)
    errors.select(col("event_id"))
      .join(matched, Seq("event_id"), "left")
      .select(col("event_id"),
        coalesce(col("n_purchases"), lit(0L)).as("n_purchases"))
      .orderBy(col("event_id"))
  }

  /** q91: hourly gap-fill + last-observation-carried-forward. Per user,
    * every hour bucket between that user's first and last event gets a
    * row: observed hours carry their event count and hourly max(value);
    * missing hours are emitted with n_events=0, filled=true, and the most
    * recent prior hour's max(value) carried forward (LOCF).
    *
    * The dense grid is generated with `sequence(h0, h1)` per user —
    * bounded by the corpus time span in hours (720 for the 30-day test
    * window), NEVER by the row count, so the explode is safe at any
    * scale. The LOCF window (`last(_, ignoreNulls)` over hours) sorts at
    * most span-many rows per user partition. `max(value)` (a selection,
    * not arithmetic) is the carried statistic precisely so the result
    * replays bit-for-bit in the oracle: no double summation order to
    * diverge on.
    */
  def q91GapFill(spark: SparkSession, dir: String): DataFrame =
    gapFill(Tables.events(spark, dir))

  /** Core of q91 over any frame with (user_id, ts, value). */
  private[graft] def gapFill(events: DataFrame): DataFrame = {
    val hourUs = 3600000000L
    val ev = events
      .select(col("user_id"),
        expr(s"unix_micros(ts) div ${hourUs}L").as("hour"),
        col("value"))
    val agg = ev.groupBy(col("user_id"), col("hour"))
      .agg(count(lit(1)).as("n_obs"), max(col("value")).as("hr_max"))
    val grid = agg.groupBy(col("user_id"))
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      .select(col("user_id"), explode(sequence(col("h0"), col("h1"))).as("hour"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(agg, Seq("user_id", "hour"), "left")
      .select(col("user_id"), col("hour"),
        coalesce(col("n_obs"), lit(0L)).as("n_events"),
        col("n_obs").isNull.as("filled"),
        last(col("hr_max"), ignoreNulls = true).over(w).as("value_locf"))
      .orderBy(col("user_id"), col("hour"))
  }

  /** q95: ordered funnel — signup → click → purchase, per user, each step
    * strictly AFTER the previous step's first completion. `stage` is how
    * far the user got (1 = signed up only, 3 = full conversion).
    *
    * Deliberately NOT a per-user event-sequence sort (the q54-class
    * scale-killer): each step is a conditional `min` aggregate gated by a
    * join against the previous step's result — three aggregates and two
    * joins, ALL keyed on user_id, so after the first exchange every
    * stage reuses the same hash partitioning. Per-user state is one
    * timestamp per step, never the event list.
    */
  def q95Funnel(spark: SparkSession, dir: String): DataFrame =
    funnel(Tables.events(spark, dir))

  /** Core of q95 over any frame with (user_id, event_type, ts). */
  private[graft] def funnel(events: DataFrame): DataFrame = {
    val ev = events.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("t"))
    val s = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("t")).as("t_signup"))
    val c = ev.filter(col("event_type") === "click")
      .join(s, Seq("user_id"))
      .where(col("t") > col("t_signup"))
      .groupBy(col("user_id")).agg(min(col("t")).as("t_click"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .where(col("t") > col("t_click"))
      .groupBy(col("user_id")).agg(min(col("t")).as("t_purchase"))
    s.join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(col("user_id"), col("t_signup"), col("t_click"), col("t_purchase"),
        (lit(1) +
          when(col("t_click").isNotNull, 1).otherwise(0) +
          when(col("t_purchase").isNotNull, 1).otherwise(0)).as("stage"))
      .orderBy(col("user_id"))
  }

  /** q96: cohort retention — users grouped by the epoch-day of their
    * first event; for day offsets 0–7, how many of each cohort were
    * active again. The classic growth-analytics triangle.
    *
    * Shape: distinct (user, day) activity, a per-user `min` for the
    * cohort day, one co-partitioned join, and a count — each (user, day)
    * pair is already unique after the distinct, so the final count needs
    * no `count(distinct)` shuffle-doubling. All integer day arithmetic.
    */
  def q96CohortRetention(spark: SparkSession, dir: String): DataFrame =
    cohortRetention(Tables.events(spark, dir))

  /** q105: funnel conversion-time profile — q95's stage-3 users bucketed
    * by signup day, with exact index-rule percentiles of the
    * signup→purchase latency. Latencies are floored to SECONDS before
    * histogramming, so the (day, seconds) histogram the percentile
    * window sorts is bounded by the latency DOMAIN, not the user count —
    * the q54/q34 round-11 discipline; raw micros would make every value
    * distinct and degrade the histogram back to a per-group sort.
    * Percentiles use the lower-index rule (value at floor(q·(n−1))) —
    * pure integer selection, replayable.
    */
  def q105ConversionProfile(spark: SparkSession, dir: String): DataFrame = {
    val conv = funnel(Tables.events(spark, dir))
      .where(col("t_purchase").isNotNull)
      .select(
        expr("t_signup div 86400000000").as("signup_day"),
        expr("(t_purchase - t_signup) div 1000000").as("ttc_s"))
    val hist = conv.groupBy(col("signup_day"), col("ttc_s"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("signup_day")).orderBy(col("ttc_s"))
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("signup_day"))))
    def vAt(index0: Column) = min(when(col("cum") >= index0 + 1, col("ttc_s")))
    cum.groupBy(col("signup_day"))
      .agg(
        max(col("n")).as("n_converted"),
        min(col("ttc_s")).as("min_s"),
        max(col("ttc_s")).as("max_s"),
        vAt(expr("(n - 1) div 2")).as("med_s"),
        vAt(floor(lit(0.9) * (col("n") - 1).cast("double"))).as("p90_s"))
      .orderBy(col("signup_day"))
  }

  /** q100: type-2 slowly-changing dimension build — each user's event
    * history compressed to its STATE CHANGES: one row per run of equal
    * `event_type`, with `valid_from`/`valid_to` micros (null `valid_to` =
    * current) and a per-user version number. The warehouse-dimension shape
    * (track attribute history, join facts by validity range) built from
    * an append-only event log in one pass.
    *
    * Two windows per user ordered by (t, event_id) — the deterministic
    * total order: the first marks rows where the state differs from its
    * predecessor (`IS DISTINCT FROM`, so the first row always opens a
    * version), the second numbers the surviving versions and closes each
    * with its successor's start. Per-user sort state is bounded by that
    * user's event count (the q33 sessionize envelope), never the table.
    */
  def q100Scd2(spark: SparkSession, dir: String): DataFrame =
    scd2(Tables.events(spark, dir))

  /** Core of q100 over any frame with (user_id, event_type, ts, event_id). */
  private[graft] def scd2(events: DataFrame): DataFrame = {
    val byTime = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("event_id"))
    val changes = events
      .select(col("user_id"), col("event_type").as("state"),
        unix_micros(col("ts")).as("t"), col("event_id"))
      .withColumn("prev", lag(col("state"), 1).over(byTime))
      .where(!(col("prev") <=> col("state")))
    changes
      .withColumn("version", row_number().over(byTime).cast("long"))
      .withColumn("valid_to", lead(col("t"), 1).over(byTime))
      .select(col("user_id"), col("version"), col("state"),
        col("t").as("valid_from"), col("valid_to"))
      .orderBy(col("user_id"), col("version"))
  }

  /** Core of q96 over any frame with (user_id, ts). */
  private[graft] def cohortRetention(events: DataFrame): DataFrame = {
    val dayUs = 86400000000L
    val active = events
      .select(col("user_id"), expr(s"unix_micros(ts) div ${dayUs}L").as("day"))
      .distinct()
    val cohort = active.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    active.join(cohort, Seq("user_id"))
      .select(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .where(col("day_offset") <= 7)
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }
}
