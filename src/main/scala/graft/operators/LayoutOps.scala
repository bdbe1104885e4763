package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators: space-filling-curve (Z-order) clustering for
  * multi-dimensional data skipping.
  *
  * The 100 TB problem this solves: parquet min/max skipping prunes on the
  * SORT column only — a table laid out by `part` answers `part = ?` scans
  * with a handful of files but reads EVERYTHING for `supplier = ?`.
  * Interleaving the bits of both keys (the Morton/Z-order curve) and
  * range-partitioning by the interleaved code keeps BOTH columns' min/max
  * ranges tight in every partition, so either predicate prunes. This is
  * the layout trick behind Delta/Iceberg `ZORDER BY`, built here from
  * plain codegen'd bit arithmetic — and exactly-replayable, so the oracle
  * checks the per-bucket skipping index value-for-value.
  */
object LayoutOps {

  /** Bits per dimension; the interleaved code is `2 * DimBits` wide. */
  private[graft] val DimBits = 16

  /** The Morton code of two dimensions, each taken mod 2^16: bit i of x
    * lands at position 2i, bit i of y at 2i+1. Pure shift/and/or —
    * whole-stage codegen keeps it in the scan's projection. */
  def morton(x: Column, y: Column): Column = {
    val xm = pmod(x, lit(1L << DimBits))
    val ym = pmod(y, lit(1L << DimBits))
    (0 until DimBits).flatMap { i =>
      Seq(
        shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(ym, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ + _) // disjoint bit positions: + == OR, and + folds better
  }

  /** q102: the Z-order skipping index of `lineitem` over
    * (l_partkey, l_suppkey) — 64 equal Morton-range buckets (the
    * range-partition layout a `repartitionByRange(morton)` write would
    * produce), each reporting its row count and BOTH dimensions' min/max
    * (the values parquet footers would carry). The proof of the layout is
    * in the numbers: every bucket's part AND supplier ranges are narrow,
    * where a one-dimensional sort leaves the other dimension's range at
    * full width (pinned quantitatively in LayoutOpsSpec).
    */
  def q102ZorderIndex(spark: SparkSession, dir: String): DataFrame =
    zorderIndex(
      Tables.lineitem(spark, dir)
        .select(col("l_partkey").as("x"), col("l_suppkey").as("y")),
      buckets = 64)
      .orderBy(col("bucket"))

  /** Core of q102: bucket rows into equal Morton-code ranges over the
    * OCCUPIED code span and report the per-bucket skipping stats over any
    * (x, y) long frame. Equal ranges over the occupied span (bounds from
    * a broadcast 1-row aggregate — no global sort, no collect) rather
    * than the absolute 2^32 space, which degenerates to a handful of
    * buckets whenever the key domain is small; an equal-COUNT layout
    * (`repartitionByRange`) would need a driver-side range sample — this
    * stays a pure two-aggregate plan. */
  def zorderIndex(df: DataFrame, buckets: Int): DataFrame = {
    val z = df.select(col("x"), col("y"), morton(col("x"), col("y")).as("z"))
    val bounds = z.agg(min(col("z")).as("z0"), max(col("z")).as("z1"))
    z.join(broadcast(bounds))
      // ceil-division width caps the last bucket at `buckets - 1`
      .withColumn("bucket",
        expr(s"(z - z0) div ((z1 - z0 + $buckets) div ${buckets}L)"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))
  }
}
