package graft.operators

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilarityOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("cosine agrees with a hand computation") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 0.0, 1.0), Seq(1.0, 1.0, 0.0))).toDF("a", "b")
    val c = df.select(SimilarityOps.cosine(col("a"), col("b"))).head.getDouble(0)
    assert(math.abs(c - 0.5) < 1e-12)
  }

  test("LSH ANN recall@10 >= 0.9 vs brute force on sf0.001") {
    val brute = SimilarityOps.q23AnnTopK(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val lsh = SimilarityOps.q24AnnLsh(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(brute.nonEmpty)
    val recall = (brute intersect lsh).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall@10 = $recall")
  }

  test("LSH candidate generation is a bucket equi-join (no cartesian)") {
    val plan = SimilarityOps.q24AnnLsh(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("cosine near-dup LSH recalls >= 0.9 of exact pairs, no cartesian") {
    import org.apache.spark.sql.functions.col
    val c = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val exact = SimilarityOps.cosineNearDup(c, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SimilarityOps.cosineNearDupLsh(c, 0.4)
    val got = lsh.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val recall = (exact intersect got).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall=$recall missing=${(exact -- got).take(5)}")
    // LSH never returns a pair the exact form rejects (verification is exact)
    assert((got -- exact).isEmpty)
    val plan = lsh.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("every query returns a full, deduplicated top-10") {
    val out = SimilarityOps.q23AnnTopK(spark, sf)
    val byQuery = out.groupBy("query_id")
      .agg(count(lit(1)).as("n"), countDistinct(col("vec_id")).as("nd"))
      .filter(col("n") =!= 10 || col("nd") =!= 10)
    assert(byQuery.isEmpty, byQuery.collect().mkString(", "))
    val nQueries = Tables.embeddings(spark, sf).filter(col("vec_id") % 50 === 0).count()
    assert(out.count() == nQueries * 10)
  }
}
