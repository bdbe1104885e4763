package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Table loaders for the driver-provided parquet testdata
  * (`/root/testdata/sf*`, see TESTDATA.md). Every query function takes the
  * scale-factor directory so the same code runs at sf0.001/0.01/0.1.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Input-parallelism repair for UNSPLITTABLE narrow scans (the
    * optimization-guide §2.5 case: "one huge unsplittable file …
    * repartition immediately after the read"). The sf testdata ships
    * every table as a single-row-group parquet file, so every scan is
    * ONE task and — because the first heavy projection (tokenize,
    * regex extraction, record synthesis) runs inside the scan stage —
    * whole query pipelines were measured running single-threaded on a
    * 32-core host (r21 profile: q116's 4.0 s tokenize stage, tasks=1).
    *
    * Scale-adaptive by construction, not a local[32] constant: when the
    * scan already yields at least `defaultParallelism` partitions (any
    * real multi-file/multi-row-group corpus — the 100 TB case), this is
    * the IDENTITY and the plan (including scan-level filter pushdown)
    * is untouched. Only a scan narrower than the cluster is widened,
    * by a deterministic HASH repartition on the table's primary key —
    * never round-robin, so task retries can't reshuffle rows, and
    * downstream groupBy/join/window on the same key reuse the
    * partitioning instead of paying a second exchange.
    */
  private def widen(df: DataFrame, key: String): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target, col(key))
    else df
  }

  /** THE ts-shape dispatch, shared by every event-feed consumer (batch
    * loader, streaming normalizer, windowed aggregation) so a new feed
    * variant is handled in exactly one place. Returns the micros-since-
    * epoch expression for a `ts` column of any supported physical shape:
    *  - ns-long (spark.sql.legacy.parquet.nanosAsLong=true; Spark has no
    *    nanosecond TimestampType): floor-divided to µs — bit-identical to
    *    DuckDB's truncating read of the same file;
    *  - TIMESTAMP_NTZ (files written by other engines, e.g. DuckDB COPY),
    *    which `unix_micros` rejects: cast under the session's UTC zone;
    *  - TIMESTAMP: read directly.
    */
  def tsMicros(df: DataFrame): Column =
    df.schema("ts").dataType match {
      case LongType         => expr("ts div 1000")
      case TimestampNTZType => unix_micros(col("ts").cast(TimestampType))
      case _                => unix_micros(col("ts"))
    }

  private def normalizeNanos(df: DataFrame): DataFrame =
    if (df.schema("ts").dataType == TimestampType) df
    else df.withColumn("ts", timestamp_micros(tsMicros(df)))

  // fact-sized tables widen on their primary key (see `widen`); the
  // dimension tables (nation/region/supplier) stay as-read — they are
  // broadcast-sized and an exchange would only add a stage
  def lineitem(spark: SparkSession, dir: String): DataFrame  = widen(apply(spark, dir, "lineitem"), "l_orderkey")
  def orders(spark: SparkSession, dir: String): DataFrame    = widen(apply(spark, dir, "orders"), "o_orderkey")
  def customer(spark: SparkSession, dir: String): DataFrame  = widen(apply(spark, dir, "customer"), "c_custkey")
  def supplier(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = widen(apply(spark, dir, "part"), "p_partkey")
  def nation(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame    = normalizeNanos(widen(apply(spark, dir, "events"), "event_id"))
  def documents(spark: SparkSession, dir: String): DataFrame = widen(apply(spark, dir, "documents"), "doc_id")
  def embeddings(spark: SparkSession, dir: String): DataFrame = widen(apply(spark, dir, "embeddings"), "vec_id")
}
