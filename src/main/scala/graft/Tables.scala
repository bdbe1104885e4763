package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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
    */
  private def normalizeNanos(df: DataFrame): DataFrame =
    if (df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df

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
