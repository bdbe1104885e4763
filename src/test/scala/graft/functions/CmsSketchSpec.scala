package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The portable Count-Min aggregate: counter-exact parity with a
  * plain-Scala reference, the one-sided estimate guarantee, and
  * partitioning invariance. Value-level oracle parity is q98's gate.
  */
class CmsSketchSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def referenceCounters(values: Seq[String]): Array[Long] = {
    val regs = new Array[Long](CmsSketch.Depth * CmsSketch.Width)
    for (v <- values; r <- 0 until CmsSketch.Depth)
      regs(r * CmsSketch.Width + CmsSketch.column(r, v.getBytes("UTF-8"))) += 1L
    regs
  }

  test("counters match the reference implementation exactly") {
    import spark.implicits._
    val values = (1 to 2000).map(i => s"tok-${i % 137}")
    val got = values.toDF("v")
      .agg(CmsSketch(col("v")).as("regs"))
      .head().getSeq[Long](0).toArray
    assert(got.toSeq == referenceCounters(values).toSeq)
  }

  test("estimates are one-sided: est >= true for every value, tight when sparse") {
    import spark.implicits._
    val corpus = Seq.fill(50)("alpha") ++ Seq.fill(20)("beta") ++ Seq.fill(3)("gamma")
    val df = corpus.toDF("v").withColumn("k", lit(1))
    val est = graft.operators.SkewOps
      .cmsFrequency(df, "k", "v", Seq("alpha", "beta", "gamma", "absent"))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(est("alpha") >= 50L && est("beta") >= 20L && est("gamma") >= 3L)
    // 3 distinct values over 4x256 counters: reference tells us exactly
    // whether any collide — assert equality whenever the reference says so
    val ref = referenceCounters(corpus)
    def refEst(p: String) = (0 until CmsSketch.Depth)
      .map(r => ref(r * CmsSketch.Width + CmsSketch.column(r, p.getBytes("UTF-8"))))
      .min
    for (p <- Seq("alpha", "beta", "gamma", "absent"))
      assert(est(p) == refEst(p), s"probe $p")
  }

  test("sketch is partitioning-invariant (sum-merge contract)") {
    import spark.implicits._
    val df = (1 to 4000).map(i => (i % 5, s"w${i % 61}")).toDF("k", "v")
    def regsOf(parts: Int) =
      df.repartition(parts).groupBy(col("k"))
        .agg(CmsSketch(col("v")).as("regs"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(regsOf(1) == regsOf(11))
  }

  test("total mass is conserved: every row sums to the input count") {
    import spark.implicits._
    val n = 1234
    val df = (1 to n).map(i => s"v$i").toDF("v")
    val regs = df.agg(CmsSketch(col("v")).as("regs")).head().getSeq[Long](0)
    for (r <- 0 until CmsSketch.Depth)
      assert(regs.slice(r * CmsSketch.Width, (r + 1) * CmsSketch.Width).sum == n.toLong)
  }
}
