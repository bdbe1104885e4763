package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout: Morton-code parity with a reference implementation and
  * the quantitative skipping claim — interleaved buckets keep BOTH
  * dimensions narrow where a one-dimensional sort leaves the other at
  * full width. Value-level oracle parity is q102's gate.
  */
class LayoutOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def refMorton(x: Long, y: Long): Long = {
    val xm = x % 65536
    val ym = y % 65536
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | ((xm >> i & 1L) << (2 * i)) | ((ym >> i & 1L) << (2 * i + 1))
    }
  }

  test("morton codes match the reference bit interleave") {
    import spark.implicits._
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (65536L, 65537L), (99999L, 7L))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), LayoutOps.morton(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for ((x, y) <- pts) assert(got((x, y)) == refMorton(x, y), s"($x, $y)")
  }

  test("z-buckets keep both dimensions narrow; 1-D sort leaves one wide") {
    import spark.implicits._
    // a dense 256x256 grid: the honest multi-dimensional workload
    val pts = for (x <- 0L until 256L; y <- 0L until 256L) yield (x, y)
    val df = pts.toDF("x", "y")
    val z = LayoutOps.zorderIndex(df, buckets = 64)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    // the grid occupies morton codes 0..65535; 64 equal ranges of 1024
    // codes are each one 32x32 tile: range 31 in BOTH dims
    assert(z.length == 64)
    assert(z.forall { case (x0, x1, y0, y1) => x1 - x0 == 31L && y1 - y0 == 31L },
      s"z buckets should be 32x32 tiles: ${z.take(3).toSeq}")
    // 1-D layout replica: bucket by x into 16-wide stripes — x is narrow
    // but y spans the full 256 everywhere
    val oneD = df.withColumn("bucket", expr(s"x div 16"))
      .groupBy("bucket")
      .agg(min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val oneDMaxY = oneD.map { case (_, _, y0, y1) => y1 - y0 }.max
    assert(oneDMaxY == 255L, s"1-D buckets span full y, got $oneDMaxY")
    // a point predicate on y alone: z-order prunes 7/8 of buckets (one
    // tile-row of the 8x8 tiling matches), the 1-D layout prunes none
    val yProbe = 200L
    val zHit = z.count { case (_, _, y0, y1) => y0 <= yProbe && yProbe <= y1 }
    val oneDHit = oneD.count { case (_, _, y0, y1) => y0 <= yProbe && yProbe <= y1 }
    assert(zHit * 8 == z.length, s"z-order should hit 1/8 of buckets: $zHit/${z.length}")
    assert(oneDHit == oneD.length, "1-D layout cannot prune on y")
  }
}
