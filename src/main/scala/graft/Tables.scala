package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Table loaders for the driver-provided parquet testdata
  * (`/root/testdata/sf*`, see TESTDATA.md). Every query function takes the
  * scale-factor directory so the same code runs at sf0.001/0.01/0.1.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Sessions reading the ns-precision `events` table must set
    * spark.sql.legacy.parquet.nanosAsLong=true (Spark has no nanosecond
    * TimestampType). The ns longs are floor-divided to microseconds here —
    * bit-identical to DuckDB's truncating read of the same file — so every
    * downstream comparison and window ordering agrees across engines.
    * Files written by other engines (e.g. DuckDB COPY) may carry
    * TIMESTAMP_NTZ, which `unix_micros` rejects — normalized to TIMESTAMP
    * under the session's UTC zone.
    */
  private def normalizeNanos(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }

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
