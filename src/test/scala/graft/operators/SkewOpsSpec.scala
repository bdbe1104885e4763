package graft.operators

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("salted distinct == plain COUNT(DISTINCT) for every key") {
    val events = Tables.events(spark, sf)
    val salted = SkewOps.saltedDistinctCount(events, "event_type", "user_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = events.groupBy("event_type")
      .agg(count_distinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain && salted.nonEmpty)
  }

  test("salted plan partitions the distinct work by (key, value-hash salt)") {
    val plan = SkewOps.saltedDistinctCount(
      Tables.events(spark, sf), "event_type", "user_id")
      .queryExecution.executedPlan.toString
    // the salt projection reaches the plan (alias shows as _groupingexpression)
    assert(plan.contains("pmod(hash(user_id"), plan)
    // and the distinct exchange is on more than the bare key
    assert(plan.linesIterator.exists(l =>
      l.contains("Exchange hashpartitioning(event_type") && l.contains("_groupingexpression")), plan)
  }

  test("HLL sketch is within its error bound on this data") {
    val events = Tables.events(spark, sf)
    val approx = SkewOps.approxDistinct(events, "event_type", "user_id", rsd = 0.02)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = events.groupBy("event_type")
      .agg(count_distinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n).toDouble / n <= 0.10, s"$k: approx=$a exact=$n")
    }
  }

  test("saltKey spreads one hot key over the salt range, deterministically") {
    import spark.implicits._
    val hot = Seq.tabulate(1000)(i => ("hotkey", i.toLong)).toDF("k", "v")
    val salted = hot.select(SkewOps.saltKey(col("k"), col("v"), 8).as("ks"))
    val n = salted.distinct().count()
    assert(n == 8, s"expected 8 salted keys, got $n")
    // deterministic: same inputs, same salts
    assert(salted.collect().map(_.getString(0)).toSeq ==
      hot.select(SkewOps.saltKey(col("k"), col("v"), 8)).collect().map(_.getString(0)).toSeq)
  }
}
