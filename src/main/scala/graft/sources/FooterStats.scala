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
  * `spark.sql.sources.useV1SourceList` by default — so this helper scopes
  * BOTH conf changes to the enclosed block and restores the session
  * afterwards. Keep the scope tight: the V2 reader is semantically
  * equivalent for the flat long/int columns these maintenance reads touch,
  * but the engine's data-path reads stay on the default reader.
  *
  * The pushdown degrades SILENTLY (plans fall back to a normal scan) when a
  * shape stops qualifying — which is why the plan shape is pinned by tests
  * (`PushedAggregation` present for both call sites) instead of trusted.
  */
object FooterStats {

  /** Run `body` — plan construction AND its actions — with the V2 parquet
    * reader and aggregate pushdown enabled, restoring both confs after.
    * The action must run inside the block: pushdown is decided when the
    * plan optimizes, not when the DataFrame is declared.
    */
  def withAggregatePushdown[T](spark: SparkSession)(body: => T): T = {
    val conf = spark.conf
    val v1Key = "spark.sql.sources.useV1SourceList"
    val aggKey = "spark.sql.parquet.aggregatePushdown"
    val prevV1 = conf.get(v1Key)
    val prevAgg = conf.get(aggKey)
    conf.set(v1Key, prevV1.split(",").map(_.trim)
      .filter(s => s.nonEmpty && s != "parquet").mkString(","))
    conf.set(aggKey, "true")
    try body
    finally {
      conf.set(v1Key, prevV1)
      conf.set(aggKey, prevAgg)
    }
  }
}
