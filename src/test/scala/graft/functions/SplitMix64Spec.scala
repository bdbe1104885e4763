package graft.functions

import graft.SparkTestSession
import graft.operators.DedupOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The sink-layout mix must be bit-for-bit the published SplitMix64
  * finalizer (== `DedupOps.splitmix`) in BOTH evaluation modes — the
  * bucket directories written under codegen must be the ones a future
  * interpreted read computes.
  */
class SplitMix64Spec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private val probes =
    Seq(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue, 0x9E3779B97F4A7C15L,
      123456789L, -987654321L)

  test("native expression == driver-side splitmix in codegen and interpreted modes") {
    import spark.implicits._
    val df = probes.toDF("x").repartition(1)
    for (mode <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try {
        val got = df.select(col("x"), SplitMix64(col("x")).as("m"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        probes.foreach { x =>
          assert(got(x) == DedupOps.splitmix(x), s"mismatch at $x in $mode")
        }
      } finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("bucket assignment is non-negative and spreads sequential keys") {
    import spark.implicits._
    val n = 10000
    val counts = spark.range(n.toLong)
      .select(pmod(SplitMix64(col("id")), lit(64L)).cast("int").as("b"))
      .groupBy("b").count().collect()
    assert(counts.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 64))
    assert(counts.length == 64, "sequential keys should reach every bucket")
    // no bucket grossly over-loaded (expected ~156 per bucket)
    assert(counts.forall(_.getLong(1) < n / 64 * 2))
  }
}
