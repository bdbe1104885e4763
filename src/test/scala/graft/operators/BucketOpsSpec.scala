package graft.operators

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Bucketed co-located join: after one bucketed write per side, the join
  * plan must contain no shuffle exchange.
  */
class BucketOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("join of two bucketed tables runs without a shuffle exchange") {
    val loc = Files.createTempDirectory("graft_buckets_").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_buckets LOCATION '$loc'")
    try {
      BucketOps.writeBucketed(
        Tables.orders(spark, sf), "graft_buckets.orders_b", "o_custkey", 8)
      BucketOps.writeBucketed(
        Tables.customer(spark, sf).withColumnRenamed("c_custkey", "o_custkey"),
        "graft_buckets.customer_b", "o_custkey", 8)

      // disable auto-broadcast so the test exercises the SMB path
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = BucketOps.coLocatedJoin(
          spark, "graft_buckets.orders_b", "graft_buckets.customer_b", "o_custkey")
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"), plan)
        assert(plan.contains("SortMergeJoin"), plan)
        // and it computes the same result as the plain join
        val expected = Tables.orders(spark, sf)
          .join(Tables.customer(spark, sf),
            col("o_custkey") === col("c_custkey")).count()
        assert(joined.count() == expected && expected > 0)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    } finally spark.sql("DROP DATABASE IF EXISTS graft_buckets CASCADE")
  }
}
