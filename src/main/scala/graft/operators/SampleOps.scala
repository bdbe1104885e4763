package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus sampling and mixing for training-data pipelines: deterministic
  * stratified sampling (keep X% of each language/domain, reproducibly) and
  * weighted-repetition mixing (up-/down-weight domains by repeating or
  * thinning them, then order the epoch deterministically) — the two knobs
  * a data-mixing recipe turns when composing a training corpus.
  *
  * DETERMINISM CONTRACT: every decision keys off integer arithmetic on the
  * stable row id — no RNG, no `rand()` — so a rerun, a replay, or a
  * different cluster produces the IDENTICAL sample/mix (the property that
  * makes ablations comparable and incident reproductions possible). The
  * keying is multiply-mod, expressible 1:1 in the DuckDB oracle for the
  * non-negative ids every engine id column carries; the id is folded
  * through `% 1000000007` before salting so the arithmetic can never
  * overflow int64 under ANSI mode for ANY long id, and rates/weights are converted
  * to INTEGER basis-point thresholds driver-side so the Spark and oracle
  * comparisons are exact (a float `rate * mod` would diverge between
  * Spark's double and DuckDB's decimal exactly at bucket boundaries). A
  * production variant can swap xxhash64 in for better avalanche at the
  * cost of oracle-checkability; the spec measures rate accuracy of this
  * keying directly.
  *
  * Scale shape (100 TB): stratified sampling is a pure projection+filter —
  * no shuffle, no state, applied at scan speed after pushdown. Mixing is
  * projection + explode (narrow, ×mean-weight, not a blow-up) + ONE range
  * sort for the epoch order — the same single-range-shuffle shape as
  * sequence packing (q39).
  */
object SampleOps {

  /** Keys per 10000 (basis points) — the rate/weight-fraction resolution. */
  private val Mod = 10000L

  /** Large prime used to fold ids into overflow-safe range before the
    * multiply: folded < 2^30, times `MixA` < 2^62.
    */
  private val FoldMod = 1000000007L

  /** Knuth's multiplicative constant (2^32 / golden ratio). */
  private val MixA = 2654435761L

  /** Deterministic per-row key in [0, mod): fold, salt, multiply, mod.
    * Distinct `salt`s decorrelate the sample / repeat / order decisions.
    * The id is pmod-folded BEFORE the salt lands, so the sum stays below
    * `FoldMod + salt` and the arithmetic cannot overflow int64 under ANSI
    * for ANY long id (adding the salt first would overflow at
    * Long.MaxValue). For non-negative ids the result is identical to
    * folding after the add — which is what the DuckDB oracles replicate
    * with sign-preserving `%`; negative ids (none of the engine's id
    * columns produce them) key deterministically here but diverge from a
    * plain-`%` oracle, which would need floorMod semantics to match.
    */
  def sampleKey(id: Column, salt: Long, mod: Long): Column =
    pmod(pmod(pmod(id, lit(FoldMod)) + lit(salt), lit(FoldMod)) * lit(MixA), lit(mod))

  /** Key granularity for exact-k sampling: a large prime so key collisions
    * (broken by id inside the struct, a negligible bias at ~1e9 buckets)
    * are rare even in billion-row strata.
    */
  private val SampleKeyMod = 999999937L

  /** Exact-k-per-group deterministic uniform subsample — "give me k
    * documents per (lang, source)", the eval-slice / inspection-sample
    * builder. Rate-based `stratifiedSample` (q41) keeps a FRACTION and its
    * output size floats with the stratum; this keeps an exact count per
    * group with bounded memory: rows are keyed by the same overflow-safe
    * multiply-mod hash (so the pick is deterministic, replayable, and
    * independent of row order/partitioning) and `BoundedTopK` retains the
    * k largest keys per group — a partial aggregate, so each map task
    * forwards at most k candidates per group and no full-group state or
    * window sort ever exists. That is the classic distributed reservoir
    * ("bottom-k by hash") made exchange-bounded; `salt` decorrelates
    * repeated draws.
    */
  def uniformGroupSample(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      k: Int,
      salt: Long = 7L): DataFrame = {
    val key = struct(
      sampleKey(col(idCol), salt, SampleKeyMod).as("skey"),
      col(idCol).as("id"))
    df.groupBy(groupCols.map(col): _*)
      .agg(graft.functions.BoundedTopK(key, k).as("picks"))
      .select(groupCols.map(col) :+ explode(col("picks")).as("pick"): _*)
      .select(groupCols.map(col) :+ col("pick.id").as(idCol): _*)
  }

  /** q60: 20 documents per (lang, source), exact and deterministic. */
  def q60UniformGroupSample(spark: SparkSession, dir: String): DataFrame =
    uniformGroupSample(Tables.documents(spark, dir), Seq("lang", "source"), "doc_id", 20)
      .orderBy(col("lang"), col("source"), col("doc_id"))

  /** Per-stratum integer CASE built driver-side. Strata conditions are
    * disjoint equality tests, so fold order is irrelevant.
    */
  private def strataCase(strataCol: String, values: Map[String, Long], dflt: Long): Column =
    values.foldLeft(lit(dflt)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }

  /** Stratified deterministic sample: keep a row iff its sample key falls
    * below its stratum's basis-point threshold (`rates` are fractions,
    * rounded to 1/10000 driver-side). One codegen'd filter — no shuffle,
    * no driver state, bit-for-bit reproducible.
    */
  def stratifiedSample(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      rates: Map[String, Double],
      defaultRate: Double): DataFrame = {
    val thresh = strataCase(strataCol,
      rates.map { case (k, r) => k -> math.round(r * Mod) },
      math.round(defaultRate * Mod))
    df.filter(sampleKey(col(idCol), 0L, Mod) < thresh)
  }

  /** q41: stratified sample of the documents corpus by language — the mix
    * recipe keeps 80% of `en`, 25% of `zh`, 50% of everything else.
    * Value-checked against the identical arithmetic in DuckDB.
    */
  def q41StratifiedSample(spark: SparkSession, dir: String): DataFrame =
    stratifiedSample(Tables.documents(spark, dir), "lang", "doc_id",
      Map("en" -> 0.8, "zh" -> 0.25), 0.5)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))

  /** Weighted-repetition mix: each stratum's rows repeat `floor(weight)`
    * times plus one more when the row's repeat key falls below the
    * weight's fractional part (decided deterministically per row); every
    * copy gets a deterministic `mix_key` and the epoch is emitted in
    * `mix_key` order. Up-weighting by repetition, down-weighting by
    * thinning — exactly how LLM data-mixing recipes express domain
    * weights: weight 0.7 keeps a deterministic 70% of the stratum once,
    * weight 2.3 emits every row twice and a deterministic 30% a third
    * time.
    */
  def weightedMix(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      weights: Map[String, Double],
      defaultWeight: Double): DataFrame = {
    def base(w: Double) = math.floor(w).toLong
    def fracBp(w: Double) = math.round((w - math.floor(w)) * Mod)
    val copies = strataCase(strataCol, weights.map { case (k, w) => k -> base(w) },
      base(defaultWeight)) +
      when(sampleKey(col(idCol), 1L, Mod) <
        strataCase(strataCol, weights.map { case (k, w) => k -> fracBp(w) },
          fracBp(defaultWeight)), 1L).otherwise(0L)
    // 2^40 key space: collisions exist (tie-broken downstream) but carry
    // no bias; 7919 (a prime) spreads copies of one row across the epoch
    df.withColumn("rep", explode(when(copies > 0,
        sequence(lit(0L), copies - 1)).otherwise(array().cast("array<bigint>"))))
      .withColumn("mix_key",
        sampleKey(col(idCol) + col("rep") * lit(7919L), 2L, 1L << 40))
  }

  /** q42: the documents corpus mixed at en×1.5, zh×0.5, others ×1.0, in
    * deterministic epoch order. Total order: (mix_key, doc_id, rep).
    */
  def q42WeightedMix(spark: SparkSession, dir: String): DataFrame =
    weightedMix(Tables.documents(spark, dir), "lang", "doc_id",
      Map("en" -> 1.5, "zh" -> 0.5), 1.0)
      .select(col("doc_id"), col("lang"), col("rep"), col("mix_key"))
      .orderBy(col("mix_key"), col("doc_id"), col("rep"))
}
