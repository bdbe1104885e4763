package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crawl-frontier scheduling — the composition query over the discovery
  * trio: sitemap recency (q145's lastmod/priority arithmetic), feed
  * freshness (q149's publication dates, folded to a per-host high-water
  * mark), and the REAL robots evaluator (q141's `parseRobots`/`decide`,
  * not a reimplementation) — producing the politeness-bucketed fetch
  * order a production crawler runs from. Single operators prove
  * pieces; a scheduler proves the pieces COMPOSE on one URL/host
  * normal form.
  *
  * Shape: the per-host rule set and the per-host freshness mark are
  * both TINY dimensions (|hosts| rows) and broadcast — the frontier
  * never shuffles for them; the only exchange is the per-host ranking
  * window, which any scheduler needs (rank is per-host by definition).
  * Politeness: allowed URLs rank by (priority DESC, lastmod DESC,
  * doc_id) within host and bucket into fetch WAVES of 50 — the crawl
  * rate limiter's unit; disallowed rows carry the winning robots
  * pattern and rank -1 (they stay visible for audit, the dead-letter
  * discipline).
  *
  * The oracle replays the whole schedule — robots verdicts (the
  * planted last-digit rules), freshness lag, ranks, and waves — from
  * doc_id arithmetic with its own window, so a verdict slip, a
  * tie-break slip, or a wave-boundary slip changes rows.
  *
  * Scale shape (100 TB): two broadcast joins + one per-host window;
  * frontier-linear, no corpus shuffle before the window.
  */
object FrontierOps {

  /** Scheduler rule file per host: last-digit-3 paths are off-limits
    * everywhere; odd hosts also block last-digit-7 — both via the
    * RFC 9309 `*`/`$` metacharacters the real evaluator implements —
    * plus a foreign-agent deny-all decoy that must never leak.
    */
  private[graft] def schedulerRobots(h: Long): String =
    "User-agent: OtherBot\nDisallow: /\nCrawl-delay: 99\n\n" +
      "User-agent: GraftBot\nDisallow: /doc/*3$\n" +
      (if (h % 2 == 1) "Disallow: /doc/*7$\n" else "") +
      "Allow: /doc/\n" +
      // the host's politeness record: 1–3 s between fetches (the
      // OtherBot group's 99 s is a decoy that must never leak)
      s"Crawl-delay: ${1 + h % 3}\n\n" +
      // the GLOBAL discovery record (ignored by the rule parser; the
      // frontier lane resolves the host's sitemap tree through it)
      s"Sitemap: https://h$h.example.test/sitemap.xml\n"

  /** The gated + per-host-ranked frame shared by q154 and q182:
    * frontier URLs gated by the real robots evaluator (verdict +
    * winning rule + the group's Crawl-delay), scored by sitemap
    * recency against the host's feed high-water mark, ranked per
    * (host, allowed).
    */
  private def gatedRanked(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    // frontier: q145's lastmod/priority arithmetic on the /doc/ space
    val lastmod = datediff(
      to_date(concat_ws("-", lit(2026),
        lpad((col("doc_id") % 12 + 1).cast("string"), 2, "0"),
        lpad((col("doc_id") % 28 + 1).cast("string"), 2, "0"))),
      to_date(lit("1970-01-01"))).cast("long")
    val urls = docs.select(
      col("doc_id"), (col("doc_id") % 8).as("h"),
      concat(lit("/doc/"), col("doc_id").cast("string")).as("path"),
      lastmod.as("lastmod_day"),
      when(col("doc_id") % 5 === 0, lit(5L))
        .otherwise(col("doc_id") % 10).as("priority_tenths"))
    // robots: the REAL q141 evaluator over the planted rule files,
    // including the GraftBot group's Crawl-delay (default 1 s)
    val hostRules = docs.select((col("doc_id") % 8).as("h")).distinct().as[Long]
      .map { h =>
        val txt = schedulerRobots(h)
        (h, RobotsOps.parseRobots(txt, "GraftBot").map(r => (r.allow, r.pattern)),
          RobotsOps.crawlDelay(txt, "GraftBot").getOrElse(1L))
      }
      .toDF("h", "rules", "crawl_delay")
    // freshness: the q149 publication dates folded per host
    val hostFresh = docs
      .select((col("doc_id") % 8).as("h"), lastmod.as("pub_day"))
      .groupBy(col("h")).agg(max(col("pub_day")).as("host_max_pub"))
    val gated = urls
      .join(broadcast(hostRules), Seq("h"))
      .join(broadcast(hostFresh), Seq("h"))
      .as[(Long, Long, String, Long, Long, Seq[(Boolean, String)], Long, Long)]
      .map { case (h, id, path, lm, prio, rules, delay, hi) =>
        val (allowed, rule) = RobotsOps.decide(
          rules.map { case (a, p) => RobotsOps.RobotsRule(a, p) }, path)
        (id, s"h$h.example.test", path, allowed, rule, lm, prio, hi - lm, delay)
      }
      .toDF("doc_id", "host", "path", "allowed", "rule", "lastmod_day",
        "priority_tenths", "fresh_lag", "crawl_delay")
    val rn = row_number().over(
      Window.partitionBy(col("host"), col("allowed"))
        .orderBy(col("priority_tenths").desc, col("lastmod_day").desc,
          col("doc_id")))
    gated.withColumn("rn", rn)
  }

  /** q154: the fetch schedule end to end — frontier URLs gated by the
    * real robots evaluator, scored by sitemap recency against the
    * host's feed high-water mark, ranked and politeness-bucketed per
    * host; every column oracle-replayed.
    */
  def q154FrontierSchedule(spark: SparkSession, dir: String): DataFrame =
    gatedRanked(spark, dir)
      .select(col("doc_id"), col("host"), col("path"), col("allowed"),
        col("rule"), col("lastmod_day"), col("priority_tenths"),
        col("fresh_lag"),
        when(col("allowed"), col("rn")).otherwise(lit(-1))
          .cast("long").as("crawl_rank"),
        when(col("allowed"), (col("rn") - 1) / 50 + 1).otherwise(lit(-1))
          .cast("long").as("fetch_wave"))
      .orderBy(col("doc_id"))

  /** Seconds per time wave in the q182 timed schedule. */
  private[graft] val WaveSeconds = 60L

  /** q182: TIMED politeness — the q154 schedule rescheduled by TIME:
    * each host's k-th allowed URL fetches at `(k−1) × Crawl-delay`
    * seconds (the per-host politeness record parsed from its robots
    * group — never the foreign group's decoy), and fetch waves become
    * 60-second TIME bands, so a 1-s host ships ~60 URLs per wave while
    * a 3-s host ships ~20 — rank bands alone cannot express that
    * interleaving. Every column oracle-replayed from the planted
    * `1 + h % 3` delays.
    */
  def q182FrontierTiming(spark: SparkSession, dir: String): DataFrame =
    gatedRanked(spark, dir)
      .select(col("doc_id"), col("host"), col("path"), col("allowed"),
        col("rule"), col("lastmod_day"), col("priority_tenths"),
        col("fresh_lag"),
        when(col("allowed"), col("rn")).otherwise(lit(-1))
          .cast("long").as("crawl_rank"),
        col("crawl_delay").cast("long").as("crawl_delay"),
        when(col("allowed"), (col("rn") - 1) * col("crawl_delay"))
          .otherwise(lit(-1)).cast("long").as("fetch_at_s"),
        when(col("allowed"),
          (col("rn") - 1) * col("crawl_delay") / WaveSeconds + 1)
          .otherwise(lit(-1)).cast("long").as("time_wave"))
      .orderBy(col("doc_id"))
}
