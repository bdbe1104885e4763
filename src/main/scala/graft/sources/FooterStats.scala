package graft.sources

import org.apache.spark.sql.SparkSession

/** Footer-statistics reads for standing-index/sink MAINTENANCE loops.
  *
  * Spark's parquet aggregate pushdown (`spark.sql.parquet.aggregatePushdown`)
  * answers MIN/MAX/COUNT — optionally grouped by partition columns — from
  * row-group footer metadata without decoding any column data, which turns a
  * maintenance statistic (per-cluster posting counts, newest event time in a
  * diff sink) from a data scan into an O(row-groups) metadata read. That is
  * exactly the cost a maintenance loop that runs per arrival batch can
  * afford at 100 TB.
  *
  * The pushdown only exists on the V2 parquet reader, and parquet sits in
  * `spark.sql.sources.useV1SourceList` by default. Rather than mutating the
  * caller's session confs (non-reentrant: two concurrent maintenance calls
  * would save each other's half-swapped values, and every query ANOTHER
  * thread plans during the window would silently take the V2 reader too),
  * the block runs on an ISOLATED child session — `newSession()` shares the
  * SparkContext and cached data but owns its SQLConf — so the caller's
  * session is never touched and concurrent use is safe by construction.
  *
  * The pushdown degrades SILENTLY (plans fall back to a normal scan) when a
  * shape stops qualifying — which is why the plan shape is pinned by tests
  * (`PushedAggregation` present for both call sites) instead of trusted.
  */
object FooterStats {

  /** Run `body` against a child session configured with the V2 parquet
    * reader and aggregate pushdown. Build the read AND run its action on
    * the session handed to `body`: pushdown is decided when that
    * session's plan optimizes.
    */
  def withAggregatePushdown[T](spark: SparkSession)(body: SparkSession => T): T = {
    val s = spark.newSession()
    val v1Key = "spark.sql.sources.useV1SourceList"
    s.conf.set(v1Key, s.conf.get(v1Key).split(",").map(_.trim)
      .filter(x => x.nonEmpty && x != "parquet").mkString(","))
    s.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    // carry over the engine's non-default session baseline that matters
    // for these reads (shuffle sizing; the ns-timestamp legacy flag the
    // diff sinks' sessions run under)
    for (k <- Seq("spark.sql.shuffle.partitions",
        "spark.sql.legacy.parquet.nanosAsLong"))
      spark.conf.getOption(k).foreach(v => s.conf.set(k, v))
    body(s)
  }
}
