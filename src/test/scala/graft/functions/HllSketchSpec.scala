package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The portable md5 HyperLogLog aggregate: register-exact parity with a
  * plain-Scala reference, partitioning invariance (the mergeability
  * contract), and estimate quality in both the HLL and linear-counting
  * regimes. Value-level oracle parity is q97's DuckDB gate.
  */
class HllSketchSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  /** Reference sketch: same md5 → (bucket, rho) mapping, written the
    * straightforward way. */
  private def referenceRegisters(values: Seq[String]): Array[Int] = {
    val regs = new Array[Int](HllSketch.M)
    val md = java.security.MessageDigest.getInstance("MD5")
    for (v <- values) {
      val h = md.digest(v.getBytes("UTF-8"))
      val bucket = h(0) & 0xff
      val bits = h.drop(1).take(15)
        .map(b => String.format("%8s", Integer.toBinaryString(b & 0xff)).replace(' ', '0'))
        .mkString
      val z = bits.takeWhile(_ == '0').length
      val rho = math.min(z + 1, HllSketch.RhoCap)
      if (rho > regs(bucket)) regs(bucket) = rho
    }
    regs
  }

  test("registers match the reference implementation exactly") {
    import spark.implicits._
    val values = (1 to 3000).map(i => s"value-$i")
    val got = values.toDF("v")
      .agg(HllSketch(col("v")).as("regs"))
      .head().getSeq[Int](0).toArray
    assert(got.toSeq == referenceRegisters(values).toSeq)
  }

  test("sketch is partitioning-invariant (mergeability contract)") {
    import spark.implicits._
    val df = (1 to 5000).map(i => (i % 7, s"v$i")).toDF("k", "v")
    def regsOf(parts: Int) =
      df.repartition(parts).groupBy(col("k"))
        .agg(HllSketch(col("v")).as("regs"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Int](1)).toMap
    assert(regsOf(1) == regsOf(13))
  }

  test("estimate within 3 sigma in the HLL regime; nulls ignored") {
    import spark.implicits._
    val n = 5000
    val df = (1 to n).map(i => s"item-$i").toDF("v")
      .union(Seq.fill(100)(null.asInstanceOf[String]).toDF("v"))
    val est = graft.operators.SkewOps
      .hllDistinct(df.withColumn("k", lit(1)), "k", "v")
      .head().getAs[Double]("hll_estimate")
    // sigma = 1.04 / sqrt(256) = 6.5%; deterministic for a fixed corpus
    assert(math.abs(est / n - 1.0) < 0.20, s"estimate $est for $n distinct")
  }

  test("linear-counting correction from n_zero rescues small cardinalities") {
    import spark.implicits._
    val n = 40 // << m: raw HLL is biased here, linear counting is not
    val df = (1 to n).map(i => s"rare-$i").toDF("v").withColumn("k", lit(1))
    val row = graft.operators.SkewOps.hllDistinct(df, "k", "v").head()
    val nZero = row.getAs[Int]("n_zero")
    assert(nZero > 0)
    // the consumer-side correction the scaladoc points to: m * ln(m / V)
    val m = HllSketch.M.toDouble
    val linear = m * math.log(m / nZero)
    assert(math.abs(linear / n - 1.0) < 0.15, s"linear estimate $linear for $n")
  }

  test("union algebra: register max == sketch of the union; I-E overlap tracks") {
    import spark.implicits._
    val a = (1 to 3000).map(i => s"v$i")
    val b = (2000 to 5000).map(i => s"v$i") // overlap: v2000..v3000 = 1001
    def sketch(vs: Seq[String]) = vs.toDF("v")
      .agg(HllSketch(col("v")).as("regs")).head().getSeq[Int](0).toArray
    val (ra, rb) = (sketch(a), sketch(b))
    val maxed = ra.zip(rb).map { case (x, y) => math.max(x, y) }
    assert(maxed.toSeq == sketch((a ++ b).distinct).toSeq,
      "register max must equal the sketch of the union — the HLL property")
    def est(regs: Array[Int]): Double = {
      val s = regs.map(r => 1L << (HllSketch.RhoCap - r)).sum
      0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 140737488355328.0 / s.toDouble
    }
    val ie = est(ra) + est(rb) - est(maxed)
    assert(math.abs(ie / 1001.0 - 1.0) < 0.5,
      s"inclusion-exclusion overlap $ie for true 1001")
  }

  test("sum of register weights equals s_scaled and bounds hold") {
    import spark.implicits._
    val df = (1 to 1000).map(i => s"x$i").toDF("v").withColumn("k", lit(1))
    val row = graft.operators.SkewOps.hllDistinct(df, "k", "v").head()
    val s = row.getAs[Long]("s_scaled")
    // s_scaled is at most the all-empty sum and at least one 2^(cap-47)=1
    assert(s > 0 && s <= 256L * (1L << 47))
    assert(row.getAs[String]("reg_digest").length == 32)
  }
}
