package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The reference's relational operator surface (SURVEY.md §2.2, R1–R12),
  * re-expressed as declarative DataFrame plans over the driver testdata so
  * Catalyst owns pushdown / pruning / join selection.
  *
  * Numeric policy for DuckDB-oracle hash parity: floating-point SUMs are
  * order-dependent, so every aggregated measure is cast to DECIMAL *before*
  * summation (exact, associative); averages are exact decimal sums divided
  * as one deterministic double op. Raw double columns pass through
  * untouched (identical bits in both engines).
  *
  * Ordering policy: every query ends in a total order (explicit tie-break
  * columns) so the row stream is deterministic under any partitioning.
  */
object RelationalOps {

  private def dec(c: Column, scale: Int = 2): Column = c.cast(DecimalType(18, scale))

  /** R-agg: TPC-H Q1-shaped grouped aggregation with map-side partial agg.
    * Reference has only argmax aggregation (DataStreamService.java:134-140);
    * this generalizes the shape to sum/avg/count for the query surface.
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .filter(col("l_quantity") > 0)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount")))).cast("double").as("sum_disc_price"),
        (sum(dec(col("l_quantity"))).cast("double") / count(col("l_quantity"))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** q55: ROLLUP over the q1 aggregate — subtotals per returnflag and a
    * grand total in ONE pass (Spark expands the grouping sets inside a
    * single Expand + aggregate, so the three granularities cost one
    * shuffle, not three queries). Group keys are coalesced to 'ALL' and
    * each key's grouping flag exposed as its own 0/1 column — NULL-free
    * output and no reliance on any engine's `grouping_id` bit order, so
    * the oracle compare is exact. The reference has no grouping-set
    * capability at all (SURVEY §2.5); this is part of the OLAP surface a
    * Spark engine owes its users anyway.
    */
  def q55Rollup(spark: SparkSession, dir: String): DataFrame = {
    // widened scan (r22): the rollup's Expand multiplies every scan row
    // 3×, so per-row work is heavy enough that the input widen measured
    // a win here (1.2 → 1.9 s without it) — the one relational query
    // that keeps the r21 repair (see the Tables widen-policy note)
    Tables.lineitemWide(spark, dir)
      .filter(col("l_quantity") > 0)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping(col("l_returnflag")).cast("long").as("g_rflag"),
        grouping(col("l_linestatus")).cast("long").as("g_lstatus"),
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        count(lit(1)).as("count_order"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
        col("g_rflag"), col("g_lstatus"),
        col("sum_qty"), col("sum_base_price"), col("count_order"))
      .orderBy(col("g_rflag"), col("g_lstatus"), col("rflag"), col("lstatus"))
  }

  /** q56: SQL set operators — the nations reachable from the customer
    * side INTERSECT / EXCEPT the supplier side, each result tagged. Spark
    * plans both as aggregates over semi/anti joins (set semantics dedup +
    * the membership test in one exchange per side); the tag column turns
    * two set queries into one deterministic, hash-comparable result. Set
    * operators are another §2.5 absence the engine owes its users.
    */
  def q56SetOps(spark: SparkSession, dir: String): DataFrame = {
    val custNations = Tables.customer(spark, dir)
      .join(Tables.nation(spark, dir),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"))
    val suppNations = Tables.supplier(spark, dir)
      .join(Tables.nation(spark, dir),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name"))
    custNations.intersect(suppNations).withColumn("tag", lit("both"))
      .unionByName(custNations.except(suppNations)
        .withColumn("tag", lit("cust_only")))
      .select(col("tag"), col("n_name"))
      .orderBy(col("tag"), col("n_name"))
  }

  /** q58: grouped top-k via the native bounded-memory aggregate
    * (`functions.BoundedTopK`) — the 3 longest documents per (lang, source)
    * by whitespace token count, ties broken by doc_id (the struct key makes
    * the order total, so the result is deterministic and oracle-exact).
    *
    * This is the THIRD top-k shape in the engine: q4/q8/q10 use
    * `row_number() <= k` (WindowGroupLimit-pruned — map-side-bounded on
    * batch, see the honest comparison in [[graft.functions.BoundedTopK]])
    * and `collect_list`-style plans hold whole groups in memory.
    * BoundedTopK matches the window's exchange bound on batch while also
    * working where the window can't: streaming standing top-k (one O(k)
    * state row per group), multi-aggregate `agg(...)` passes, and direct
    * array output. `posexplode` turns the descending array back into
    * ranked rows here only so the oracle can compare row-by-row.
    */
  def q58TopKPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val key = struct(
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      col("doc_id").as("doc_id"))
    Tables.documents(spark, dir)
      .groupBy(col("lang"), col("source"))
      .agg(graft.functions.BoundedTopK(key, 3).as("top"))
      .select(col("lang"), col("source"), posexplode(col("top")))
      .select(
        col("lang"), col("source"),
        (col("pos") + 1).cast("long").as("rank"),
        col("col.n_tokens").as("n_tokens"),
        col("col.doc_id").as("doc_id"))
      .orderBy(col("lang"), col("source"), col("rank"))
  }

  /** R2 filter + R3 projection/alias: predicate conjunctions pushed to the
    * parquet scan (mirrors channel='messages' AND type='list' filters,
    * CdcCheckpointDao.java:72).
    */
  def q2FilterProject(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_quantity") < 24)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").as("qty"),
        col("l_extendedprice").as("price"),
        col("l_returnflag").as("rflag"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** R1 inner equi join (checkpoint_writes ⋈ checkpoints analog,
    * CdcCheckpointDao.java:70-71). No broadcast hint: customer scales
    * linearly with the data, so AQE must pick the strategy (broadcast at
    * small SF, shuffle join with skew handling at 100 TB).
    */
  def q3JoinInner(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    o.join(c, o("o_custkey") === c("c_custkey"), "inner")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("o_orderkey"), col("c_name"), col("o_totalprice"), col("o_orderstatus"))
      .orderBy(col("o_orderkey"))
  }

  /** R4 window rank + R5 top-1 (Q1's ROW_NUMBER ... rn=1 shape,
    * CdcCheckpointDao.java:69-78): latest event per user. Catalyst rewrites
    * the rn=1 filter into WindowGroupLimit so no full sort per partition.
    * event_id is the deterministic tie-break within equal timestamps.
    */
  def q4WindowLatest(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      .orderBy(col("user_id"))
  }

  /** R6 distinct projection (SELECT DISTINCT task_path analog,
    * CdcCheckpointDao.java:155-187).
    */
  def q5Distinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(col("event_type")).distinct().orderBy(col("event_type"))

  /** R8 JSON field extraction + R9 timestamp handling
    * (c.checkpoint->>'ts' / timestamptz(...), CdcCheckpointDao.java:67).
    * events.ts is ns-precision parquet; Spark truncates to micros, so the
    * timestamp is exposed as unix micros for engine-independent comparison.
    */
  def q6JsonExtract(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast("long").as("k_num"),
        unix_micros(col("ts")).as("ts_us"))
      .filter(col("k_num") >= 50)
      .orderBy(col("event_id"))
  }

  /** R10 JSON construction (the CDC trigger's json_build_object payload,
    * CdcAgentsPostgresSubscriber.java:33).
    */
  def q7JsonBuild(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .filter(col("event_type") === "signup")
      .select(
        col("event_id"),
        to_json(struct(col("event_id"), col("event_type"), col("user_id"))).as("payload"))
      .orderBy(col("event_id"))
  }

  /** R5 sort + limit generalized to top-k with a total tie-break order. */
  def q8TopK(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** Multi-way join + grouped agg (TPC-H Q5 shape): fact-to-dims star join.
    * Fixed-cardinality dims (nation 25 rows, region 5 rows) are broadcast;
    * customer grows with the data so its join is left to AQE — at 100 TB it
    * becomes a shuffle join, never a forced multi-GB broadcast.
    */
  def q9MultiJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o  = Tables.orders(spark, dir)
    val c  = Tables.customer(spark, dir)
    val n  = Tables.nation(spark, dir)
    val r  = Tables.region(spark, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount")))).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"))
  }

  /** R7 CTE + R4 window: top-3 purchases per user (ranked-CTE shape of Q1,
    * CdcCheckpointDao.java:63-78, with k=3 instead of 1).
    */
  def q10RankedCte(spark: SparkSession, dir: String): DataFrame = {
    val ranked = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id"))))
    ranked.filter(col("rn") <= 3)
      .select(col("user_id"), col("event_id"), col("value"), col("rn"))
      .orderBy(col("user_id"), col("rn"))
  }

  /** Left-semi join (EXISTS): customers that have at least one order. */
  def q11SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Left-anti join (NOT EXISTS): customers with no activity in the event
    * stream (non-degenerate on the testdata: user_id covers only a prefix of
    * the customer keyspace).
    */
  def q12AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val e = Tables.events(spark, dir)
    c.join(e, c("c_custkey") === e("user_id"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** D1 group-by + argmax (DataStreamService.java:134-140: keep the
    * checkpoint with max checkpointNs per task) via max_by over a struct
    * ordering — one shuffle, map-side partial, no window sort.
    */
  def q13Argmax(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.groupBy(col("user_id"))
      .agg(
        max_by(struct(col("event_id"), col("event_type"), col("value")),
          struct(col("ts"), col("event_id"))).as("latest"),
        max(unix_micros(col("ts"))).as("max_ts_us"))
      .select(
        col("user_id"),
        col("latest.event_id").as("event_id"),
        col("latest.event_type").as("event_type"),
        col("latest.value").as("value"),
        col("max_ts_us"))
      .orderBy(col("user_id"))
  }

  /** R11 string→bytes encode (convert_to(s,'UTF-8'), CheckpointDaoTest.java:109),
    * surfaced as hex for engine-independent comparison.
    */
  def q14Encode(spark: SparkSession, dir: String): DataFrame = {
    Tables.nation(spark, dir)
      .select(col("n_nationkey"), hex(encode(col("n_name"), "UTF-8")).as("name_hex"))
      .orderBy(col("n_nationkey"))
  }

  /** Grouped time-bucket aggregation over the event stream (batch form of
    * the tumbling-window shape used by the streaming layer).
    */
  def q15TimeBucket(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(dec(col("value"))).cast("double").as("sum_value"))
      .orderBy(col("day"), col("event_type"))
  }

  /** q34: grouped value-distribution stats — count/min/max plus EXACT
    * interpolated quantiles computed from a `(event_type, value) → count`
    * HISTOGRAM instead of Spark's `median`/`percentile` aggregates. The
    * builtin Percentile is a TypedImperativeAggregate that buffers every
    * group value in executor memory and sorts it — the same
    * whole-group-in-one-task shape q54 had, an OOM/straggler at 100 TB.
    * Here the corpus reduces to a partial-combined histogram first
    * (bounded by the value DOMAIN, not the row count), a window cumulates
    * counts over histogram rows only, and the two bracketing values per
    * quantile are read off the cumulative counts.
    *
    * The interpolation replays `Percentile.getPercentile` VERBATIM —
    * `pos = p·(n-1)`, `(higher-pos)·v[lower] + (pos-lower)·v[higher]`,
    * lower==higher → v[lower] — the exact double arithmetic that already
    * hash-matches DuckDB's `median`/`quantile_cont`, so the oracle row
    * stays green bit-for-bit.
    */
  def q34ValueStats(spark: SparkSession, dir: String): DataFrame =
    valueStats(Tables.events(spark, dir))

  /** Core of q34 over any frame with (event_type, value) — split out so
    * the nullable-corpus spec can prove the NULL-skip semantics on a
    * frame the parquet tables can't produce (events.value is
    * non-nullable by construction).
    */
  private[graft] def valueStats(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = events
      // percentile semantics ignore NULLs (as the replaced median/
      // percentile aggregates and the DuckDB quantile_cont oracle do);
      // without this a nullable value column would form a NULL histogram
      // bucket and silently shift n/cum
      .where(col("value").isNotNull)
      .groupBy(col("event_type"), col("value"))
      .agg(count(lit(1)).as("cnt"))
    val cum = hist
      .withColumn("cum",
        sum(col("cnt")).over(Window.partitionBy(col("event_type")).orderBy(col("value"))))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("event_type"))))
    // value at 0-based sorted index i = smallest value with cum >= i+1
    def vAt(index0: Column) = min(when(col("cum") >= index0 + 1, col("value")))
    def bracket(tag: String, p: Double) = {
      val pos = lit(p) * (col("n") - 1).cast("double")
      Seq(vAt(floor(pos)).as(s"lv_$tag"), vAt(ceil(pos)).as(s"hv_$tag"))
    }
    val agg = cum.groupBy(col("event_type")).agg(
      max(col("n")).as("n"),
      Seq(min(col("value")).as("min_v"), max(col("value")).as("max_v")) ++
        bracket("med", 0.5) ++ bracket("p90", 0.9): _*)
    def interp(tag: String, p: Double) = {
      val pos = lit(p) * (col("n") - 1).cast("double")
      val lower = floor(pos)
      val higher = ceil(pos)
      when(higher === lower, col(s"lv_$tag"))
        .otherwise((higher.cast("double") - pos) * col(s"lv_$tag") +
          (pos - lower.cast("double")) * col(s"hv_$tag"))
    }
    agg.select(col("event_type"), col("n"), col("min_v"), col("max_v"),
        interp("med", 0.5).as("med_v"), interp("p90", 0.9).as("p90_v"))
      .orderBy(col("event_type"))
  }

  /** q94: pivot — long-to-wide reshaping of the event stream into one row
    * per user with a count column per event type. The value list is given
    * EXPLICITLY (`pivot(col, values)`), which matters twice at scale: it
    * skips the eager driver-side `distinct` job Spark otherwise runs to
    * discover the columns, and it keeps the output schema static so the
    * plan is a single hash aggregate with `count(CASE WHEN ...)` columns —
    * no second shuffle, no dynamic schema surprises. Missing combinations
    * surface as 0 (the FILTER-aggregate oracle's shape), not null.
    */
  def q94Pivot(spark: SparkSession, dir: String): DataFrame =
    pivotCounts(Tables.events(spark, dir))

  /** Core of q94 over any frame with (user_id, event_type). */
  private[graft] def pivotCounts(events: DataFrame): DataFrame = {
    val types = Seq("click", "view", "purchase", "signup", "error")
    events
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .select(col("user_id") +: types.map(t =>
        coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
      .withColumn("n_total",
        types.map(t => col(s"n_$t")).reduce(_ + _))
      .orderBy(col("user_id"))
  }
}
