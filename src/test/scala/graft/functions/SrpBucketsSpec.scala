package graft.functions

import graft.{SparkTestSession, Tables}
import graft.operators.SimilarityOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native SrpBuckets vs the pure-builtin literal-plane fold: keys must be
  * bit-identical on real data and on the degenerate shapes (null element,
  * dimension mismatch, empty array) whose builtin null-propagation the
  * native loop reproduces.
  */
class SrpBucketsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def compare(df: org.apache.spark.sql.DataFrame, tables: Int, bits: Int): Unit = {
    val out = df.select(
      SimilarityOps.srpBuckets(col("v"), tables, bits).as("native"),
      SimilarityOps.srpBucketsBuiltins(col("v"), tables, bits).as("builtin"))
      .collect()
    out.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"native=${r.getSeq[Long](0).take(5)} builtin=${r.getSeq[Long](1).take(5)}")
    }
  }

  test("parity with the builtin fold on the embeddings corpus") {
    val c = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("embedding").cast("array<double>").as("v"))
    compare(c, tables = 24, bits = 3)
    compare(c, tables = 8, bits = 9)
  }

  test("parity on degenerate shapes: null element, dim mismatch, empty") {
    import spark.implicits._
    val rows = Seq(
      Seq.fill(64)(0.5),                                  // well-formed
      Seq.fill(64)(0.5).updated(7, Double.NaN),           // NaN rides along
      Seq.fill(32)(1.0),                                  // wrong dim
      Seq.empty[Double])                                  // empty
      .toDF("v").select(col("v").cast("array<double>").as("v"))
    compare(rows, tables = 4, bits = 3)
    val withNull = Seq(Tuple1(Seq[java.lang.Double](1.0, null) ++ Seq.fill(62)(java.lang.Double.valueOf(0.25))))
      .toDF("v").select(col("v").cast("array<double>").as("v"))
    compare(withNull, tables = 4, bits = 3)
  }

  test("interpreted path matches codegen (eval parity)") {
    // force the interpreted path by eval'ing the expression directly
    val vec = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array.tabulate(64)(i => (i % 7 - 3).toDouble))
    val interp = SrpFold.buckets(vec, 24, 3, 64).toLongArray().toSeq
    import spark.implicits._
    val viaPlan = Seq(Tuple1(Array.tabulate(64)(i => (i % 7 - 3).toDouble).toSeq))
      .toDF("v")
      .select(SimilarityOps.srpBuckets(col("v"), 24, 3).as("k"))
      .head.getSeq[Long](0)
    assert(interp == viaPlan)
  }
}
