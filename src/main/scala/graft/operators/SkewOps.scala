package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-resilient aggregation patterns and cardinality sketches.
  *
  * At 100 TB a handful of hot keys can pin a whole stage on one executor.
  * Plain sum/count group-bys are already safe (map-side partial
  * aggregation), but per-key DISTINCT work concentrates the full value set
  * of a hot key on one task. The salted two-phase shape splits each key's
  * value space across `salts` sub-keys (value-hash salting, so equal
  * values land on equal salts and per-salt distinct counts add exactly),
  * aggregates partially, then merges — bounded per-task state regardless
  * of key skew. AQE's skew-join handling covers the join side; this covers
  * aggregation.
  */
object SkewOps {

  /** Exact distinct count per key via value-hash salting: phase 1 computes
    * `count(distinct valueCol)` per (key, salt) — each task sees only
    * 1/`salts` of a hot key's values — and phase 2 sums the disjoint
    * partial counts.
    */
  def saltedDistinctCount(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      salts: Int = 16): DataFrame =
    df.groupBy(col(keyCol), pmod(hash(col(valueCol)), lit(salts)).as("salt"))
      .agg(count_distinct(col(valueCol)).as("partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("partial")).as("n_distinct"))

  /** q27: exact distinct users per event type through the salted two-phase
    * plan — value-identical to a plain COUNT(DISTINCT), which is the
    * oracle.
    */
  def q27SaltedDistinct(spark: SparkSession, dir: String): DataFrame =
    saltedDistinctCount(Tables.events(spark, dir), "event_type", "user_id")
      .orderBy(col("event_type"))

  /** HyperLogLog++ cardinality sketch per key (Spark's built-in
    * approx_count_distinct) — the constant-memory path when exact distinct
    * is not required; mergeable across partitions by construction.
    */
  def approxDistinct(df: DataFrame, keyCol: String, valueCol: String, rsd: Double = 0.05): DataFrame =
    df.groupBy(col(keyCol))
      .agg(approx_count_distinct(col(valueCol), rsd).as("approx_distinct"))

  /** Salted key column for join-side hot keys: append a random-ish salt
    * derived from other columns to spread one key over `salts` partitions
    * (the dimension side must be exploded over the same salt range).
    * Provided as a building block; AQE skew-join handles the common case.
    */
  def saltKey(key: Column, entropy: Column, salts: Int): Column =
    concat_ws("#", key, pmod(hash(entropy), lit(salts)).cast("string"))

  /** q97: the portable HyperLogLog sketch ([[graft.functions.HllSketch]])
    * over distinct event ids per event type — emitted as the sketch's
    * derived scalars so every column oracle-replays:
    *   - `s_scaled`  = Σ_b 2^(47 − register_b), the estimate's
    *     denominator as an ORDER-INDEPENDENT exact integer;
    *   - `n_zero`    = empty registers (the linear-counting input — the
    *     consumer applies the small-range correction, which needs `ln`
    *     and therefore deliberately stays OUT of the replayed columns);
    *   - `hll_estimate` = alpha_m · m² · 2^47 / s_scaled, pure IEEE
    *     division of replayed values — bit-identical in both engines;
    *   - `reg_digest` = md5 over the comma-joined register array: pins
    *     the ENTIRE sketch, not just its summary.
    *
    * Scale story: one 256-byte state per group, merged by byte-max — the
    * sketch-once/merge-forever pattern. The same aggregate runs unchanged
    * in a streaming `groupBy().agg()` (plain TypedImperativeAggregate).
    */
  def q97HllSketch(spark: SparkSession, dir: String): DataFrame =
    hllDistinct(
      Tables.events(spark, dir)
        .select(col("event_type"), col("event_id").cast("string").as("v")),
      "event_type", "v")
      .orderBy(col("event_type"))

  /** Core of q97: sketch `valueCol`'s distincts per `keyCol`. */
  def hllDistinct(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    val cap = graft.functions.HllSketch.RhoCap
    val m = graft.functions.HllSketch.M
    // fixed operation order, shared with the oracle SQL: alpha first,
    // then m^2, then the 2^cap numerator, then ONE division
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    df.groupBy(col(keyCol))
      .agg(graft.functions.HllSketch(col(valueCol)).as("regs"))
      .select(col(keyCol),
        expr(s"aggregate(regs, 0L, (acc, r) -> acc + shiftleft(1L, $cap - r))")
          .as("s_scaled"),
        size(expr("filter(regs, r -> r = 0)")).as("n_zero"),
        md5(expr("concat_ws(',', transform(regs, r -> cast(r AS string)))"))
          .as("reg_digest"))
      .withColumn("hll_estimate",
        alpha * lit((m.toLong * m).toDouble) * lit(math.pow(2.0, cap).toLong.toDouble) /
          col("s_scaled").cast("double"))
  }

  /** q103: SKETCH ALGEBRA — the estimated distinct-user overlap between
    * every pair of event types, computed from the q97 HLL registers
    * alone: union = elementwise register max (`zip_with(..., greatest)`
    * — the defining HLL property), intersection by inclusion–exclusion
    * `|A∩B| ≈ est(A) + est(B) − est(A∪B)`, with the EXACT overlap
    * joined alongside so the error is visible in the result. This is
    * what makes sketches an interchange format and not a summary
    * statistic: five per-type sketches answer all ten pairwise overlap
    * questions with no second pass over the data — at 100 TB the
    * per-segment sketches are tiny standing state and every cross-segment
    * question is register arithmetic. The pair frame is an explicit
    * O(types²) broadcast cross of the 5-row sketch table (documented —
    * the input is already aggregated; nothing row-scale is crossed).
    */
  def q103HllIntersect(spark: SparkSession, dir: String): DataFrame = {
    val cap = graft.functions.HllSketch.RhoCap
    val m = graft.functions.HllSketch.M
    val alphaM2 = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble)) *
      lit((m.toLong * m).toDouble) * lit((1L << cap).toDouble)
    def est(regsName: String) = alphaM2 /
      expr(s"aggregate($regsName, 0L, (acc, r) -> acc + shiftleft(1L, $cap - r))")
        .cast("double")
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id").cast("string").as("v"))
    val sk = ev.groupBy(col("event_type"))
      .agg(graft.functions.HllSketch(col("v")).as("regs"))
    val pairs = sk.select(col("event_type").as("type_a"), col("regs").as("ra"))
      .crossJoin(broadcast(
        sk.select(col("event_type").as("type_b"), col("regs").as("rb"))))
      .where(col("type_a") < col("type_b"))
    val users = ev.distinct()
    val exact = users.select(col("event_type").as("type_a"), col("v"))
      .join(users.select(col("event_type").as("type_b"), col("v")), Seq("v"))
      .where(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_exact"))
    pairs
      .withColumn("ru", expr("zip_with(ra, rb, (x, y) -> greatest(x, y))"))
      .withColumn("est_a", est("ra"))
      .withColumn("est_b", est("rb"))
      .withColumn("est_union", est("ru"))
      .withColumn("est_intersect", col("est_a") + col("est_b") - col("est_union"))
      .join(exact, Seq("type_a", "type_b"), "left")
      .select(col("type_a"), col("type_b"), col("est_a"), col("est_b"),
        col("est_union"), col("est_intersect"),
        coalesce(col("n_exact"), lit(0L)).as("n_exact"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** The q98 probe workload: frequent corpus tokens plus one absent
    * token (its estimate is pure collision mass — the overshoot bound's
    * witness). */
  private[graft] val CmsProbes = Seq("table", "data", "spark", "window", "zzzz")

  /** q98: Count-Min frequency sketch ([[graft.functions.CmsSketch]]) of
    * the token stream per language, probed for a fixed token list —
    * `est_count` is the sketch's min-over-rows answer (≥ the true count,
    * one-sided), `reg_digest` pins all 1024 counters. The probe columns
    * are LITERALS (each probe's four counter positions are md5'd on the
    * driver, the same arithmetic the executors run per row), so the probe
    * step is a pure projection over the 5 sketch rows — no second pass
    * over the corpus, which is the entire point of a frequency sketch.
    */
  def q98CmsSketch(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("lang"), explode(split(lower(col("text")), " ")).as("v"))
    cmsFrequency(toks, "lang", "v", CmsProbes).orderBy(col("lang"), col("token"))
  }

  /** q101: portable Bloom membership filter
    * ([[graft.functions.BloomSketch]]) of the token stream per language,
    * probed for q98's fixed token list — `hit` is the filter's
    * no-false-negative answer, `bits_set` its fill (the FPR input,
    * ~(bits_set/2048)^4), `filter_digest` pins all 128 words. Probe bit
    * positions are driver-computed literals (the q98 pattern): probing is
    * a projection over 5 filter rows, no second corpus pass. Completes
    * the sketch family — q97 answers "how many distinct", q98 "how
    * often", q101 "was this one seen" — all md5-portable, all mergeable
    * (max / add / OR), all replayed value-exact by the oracle where
    * Spark's own `bloom_filter_agg` blob is an opaque private-hash box.
    */
  def q101BloomSketch(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("lang"), explode(split(lower(col("text")), " ")).as("v"))
    bloomMembership(toks, "lang", "v", CmsProbes)
      .orderBy(col("lang"), col("token"))
  }

  /** Core of q101: build the per-key filter, then answer the probe list
    * from the filter alone. */
  def bloomMembership(
      df: DataFrame, keyCol: String, valueCol: String,
      probes: Seq[String]): DataFrame = {
    import graft.functions.BloomSketch.{Probes, WordBits, bitPos}
    val filt = df.groupBy(col(keyCol))
      .agg(graft.functions.BloomSketch(col(valueCol)).as("words"))
      .withColumn("filter_digest",
        md5(expr("concat_ws(',', transform(words, x -> cast(x AS string)))")))
      .withColumn("bits_set",
        expr("aggregate(words, 0, (acc, w) -> acc + bit_count(w))"))
    val probeArr = array(probes.map { p =>
      val bytes = p.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val fields = (0 until Probes).flatMap { i =>
        val pos = bitPos(i, bytes)
        Seq(lit(pos / WordBits).as(s"w$i"), lit(pos % WordBits).as(s"b$i"))
      }
      struct(lit(p).as("token") +: fields: _*)
    }: _*)
    val hit = (0 until Probes)
      .map(i => expr(s"(shiftright(element_at(words, probe.w$i + 1), probe.b$i) & 1) = 1"))
      .reduce(_ && _)
    filt.select(col(keyCol), col("bits_set"), col("filter_digest"),
        col("words"), explode(probeArr).as("probe"))
      .select(col(keyCol), col("probe.token").as("token"), hit.as("hit"),
        col("bits_set"), col("filter_digest"))
  }

  /** Core of q98: sketch `valueCol`'s frequencies per `keyCol`, then
    * answer the probe list from the sketch alone. */
  def cmsFrequency(
      df: DataFrame, keyCol: String, valueCol: String,
      probes: Seq[String]): DataFrame = {
    import graft.functions.CmsSketch.{Depth, Width, column}
    val sk = df.groupBy(col(keyCol))
      .agg(graft.functions.CmsSketch(col(valueCol)).as("regs"))
      .withColumn("reg_digest",
        md5(expr("concat_ws(',', transform(regs, x -> cast(x AS string)))")))
    val probeArr = array(probes.map { p =>
      val bytes = p.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      struct(lit(p).as("token") +:
        (0 until Depth).map(r => lit(column(r, bytes)).as(s"c$r")): _*)
    }: _*)
    sk.select(col(keyCol), col("reg_digest"), col("regs"),
        explode(probeArr).as("probe"))
      .select(col(keyCol), col("probe.token").as("token"),
        least((0 until Depth).map(r =>
          element_at(col("regs"), col(s"probe.c$r") + lit(r * Width) + 1)): _*)
          .as("est_count"),
        col("reg_digest"))
  }
}
