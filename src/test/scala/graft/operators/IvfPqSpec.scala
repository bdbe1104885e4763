package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVF-PQ (round-13 stretch): product-quantization codes with exact
  * integer ADC scoring, parity legs, and the refine-stage recall gate.
  */
class IvfPqSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def corpus = graft.Tables.embeddings(spark, sf)
    .repartition(col("vec_id"))
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  test("codebooks are integer, deterministic, and correctly shaped") {
    val qc = SimilarityOps.quantizeInt8(corpus, "v")
      .select(col("vec_id"), col("qv"))
    val cb1 = SimilarityOps.trainPqCodebooks(qc, m = 8, ksub = 16)
    val cb2 = SimilarityOps.trainPqCodebooks(qc, m = 8, ksub = 16)
    assert(cb1.length == 8)
    for ((sub1, sub2) <- cb1.zip(cb2)) {
      assert(sub1.length <= 16 && sub1.nonEmpty)
      for ((c1, c2) <- sub1.zip(sub2)) {
        assert(c1.length == 8)
        assert(c1.sameElements(c2), "training is not deterministic")
        // integer entries stay in the int8-derived envelope
        assert(c1.forall(x => math.abs(x) <= 127))
      }
    }
  }

  test("pqEncode: codes select the true nearest sub-centroid; rs2 is exact") {
    val qc = SimilarityOps.quantizeInt8(corpus, "v")
      .select(col("vec_id"), col("qv"))
    val cb = SimilarityOps.trainPqCodebooks(qc, m = 8, ksub = 16)
    val rows = SimilarityOps.pqEncode(qc, cb)
      .select(col("vec_id"), col("qv"), col("codes"), col("rs2"))
      .limit(50).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val qv = r.getSeq[Int](1).toArray
      val codes = r.getSeq[Int](2).toArray
      var rs2 = 0L
      for (j <- 0 until 8) {
        val sv = qv.slice(j * 8, (j + 1) * 8)
        // reference argmin with the same lowest-index tie-break
        val dists = cb(j).map(cv =>
          sv.zip(cv).map { case (x, c) => val d = x - c; d * d }.sum)
        assert(codes(j) == dists.indexOf(dists.min),
          s"vec ${r.getLong(0)} subspace $j")
        rs2 += cb(j)(codes(j)).map(x => x * x).sum
      }
      assert(r.getLong(3) == rs2, s"rs2 mismatch for vec ${r.getLong(0)}")
    }
  }

  test("registered q115 parity legs all pin to 10; plan has no cartesian/BNLJ") {
    val df = SimilarityOps.q115IvfPq(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    for (r <- rows; i <- 1 to 3)
      assert(r.getLong(i) == 10, s"PQ parity divergence at ${r.getLong(0)}: $r")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("refined IVF-PQ recall@10 >= 0.9 vs brute force on sf0.001") {
    // the structureless worst case — defaults are sized for exactly this
    // (see annTopKIvfPq's scaladoc sweep); clustered corpora do better
    val c = corpus
    val q = c.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val brute = SimilarityOps.q23AnnTopK(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val pq = SimilarityOps.annTopKIvfPq(c, q, 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(brute.nonEmpty)
    val recall = (brute intersect pq).size.toDouble / brute.size
    assert(recall >= 0.9, s"IVF-PQ recall@10 = $recall")
  }

  test("q120: standing-index probe == in-query probe bit-for-bit; legs pin to 10") {
    val base = java.nio.file.Files.createTempDirectory("graft_pqidx_").toString
    val c = corpus
    SimilarityOps.buildIvfPqIndex(c, s"$base/idx")
    val q = c.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val fromIndex = SimilarityOps
      .annTopKIvfPqIndexed(spark, s"$base/idx", q, 10, nprobe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // in-query twin under the identical deterministic training
    val cents = SimilarityOps.trainIvfCentroids(c, 16, trainSampleMod = 4)
    val qc = SimilarityOps.quantizeInt8(c, "v")
    val cb = SimilarityOps.trainPqCodebooks(
      qc.select(col("vec_id"), col("qv")), m = 8, ksub = 16)
    val postings = SimilarityOps.pqEncode(
      qc.select(col("vec_id"), col("qv"))
        .join(SimilarityOps.q115Assignments(c, cents), Seq("vec_id")), cb)
      .select(col("vec_id"), col("cid"), col("codes"), col("rs2"))
    val qq = qc.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv_raw"),
        col("qv").as("qqv"), col("qs2").as("qs2q"))
    val live = SimilarityOps.pqProbeLeg(postings, cents, cb, qq, 10, 16, adcLeg = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fromIndex.nonEmpty && fromIndex == live,
      s"storage diverged: idx-only=${(fromIndex -- live).take(3)} " +
        s"live-only=${(live -- fromIndex).take(3)}")
    // the registered q120 legs all pin
    val rows = SimilarityOps.q120IvfPqIndexed(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows; i <- 1 to 3)
      assert(r.getLong(i) == 10, s"q120 divergence at ${r.getLong(0)}: $r")
  }

  test("ADC leg == reconstruction leg bit-for-bit including integer scores") {
    // beyond q115's count pins: the two legs' full (query, rank, vec_id,
    // qdot) row sets must be IDENTICAL — the same exact-int64 sum through
    // different expression trees (per-subspace table lookups vs
    // decode-concat-dot)
    val c = corpus
    val cents = SimilarityOps.trainIvfCentroids(c, 16, trainSampleMod = 4)
    val qc = SimilarityOps.quantizeInt8(c, "v")
    val cb = SimilarityOps.trainPqCodebooks(
      qc.select(col("vec_id"), col("qv")), m = 8, ksub = 16)
    val postings = SimilarityOps.pqEncode(
      qc.select(col("vec_id"), col("qv"))
        .join(SimilarityOps.q115Assignments(c, cents), Seq("vec_id")), cb)
      .select(col("vec_id"), col("cid"), col("codes"), col("rs2"))
    val qq = qc.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv_raw"),
        col("qv").as("qqv"), col("qs2").as("qs2q"))
    def rowsOf(adc: Boolean) =
      SimilarityOps.pqProbeLeg(postings, cents, cb, qq, 10, 16, adc)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    val a = rowsOf(true)
    val b = rowsOf(false)
    assert(a.nonEmpty && a == b,
      s"legs diverge: onlyA=${(a -- b).take(3)} onlyB=${(b -- a).take(3)}")
  }
}
