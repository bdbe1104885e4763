package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Parameterized keyed lookups (SURVEY §2.2 R12, §2.1 S3): the reference
  * ships `WHERE thread_id = ? AND task_path = ?` prepared statements to
  * Postgres on every event (`dao/CdcCheckpointDao.java:51-187`). The Spark
  * equivalents:
  *
  *  - point lookup: equality conjunctions that Catalyst pushes into the
  *    scan (parquet `PushedFilters` / JDBC `WHERE` pushdown) — one plan,
  *    source-agnostic;
  *  - batch lookup: a broadcast left-semi join against the key set — the
  *    set-oriented replacement for the reference's per-key N+1 query loop
  *    (wart C5): one scan instead of |keys| round trips.
  *
  * For a JDBC source the same code applies over `spark.read.jdbc` (filters
  * reach the remote `WHERE` clause); unavailable in this zero-egress
  * environment, so tests exercise the parquet pushdown path.
  */
object Lookup {

  /** Point lookup: AND of key=value equality predicates, pushed to the
    * scan. Values may be Column literals or plain Scala values.
    */
  def pointLookup(df: DataFrame, keys: Map[String, Any]): DataFrame = {
    require(keys.nonEmpty, "pointLookup requires at least one key")
    val pred = keys.map { case (k, v) =>
      v match {
        case c: Column => col(k) === c
        case other     => col(k) === lit(other)
      }
    }.reduce(_ && _)
    df.filter(pred)
  }

  /** Batch keyed lookup: restrict `df` to rows whose `keyCols` appear in
    * `keysDf` via a broadcast left-semi join (keys-of-interest are small by
    * construction; the fact side never moves).
    */
  def batchLookup(df: DataFrame, keysDf: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "batchLookup requires key columns")
    val cond = keyCols.map(k => df(k) === keysDf(k)).reduce(_ && _)
    df.join(broadcast(keysDf), cond, "left_semi")
  }
}
