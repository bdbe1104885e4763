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

  def lineitem(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame    = normalizeNanos(apply(spark, dir, "events"))
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
