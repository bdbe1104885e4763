package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ContaminationScoreSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("exact fractions and bands on a hand-built corpus") {
    import spark.implicits._
    val evalSet = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    // doc 1: 10 words → 6 shingles, 2 shared ("alpha..epsilon", "beta..zeta")
    //   → 2*10000 div 6 = 3333 bp → contaminated
    // doc 2: same words scrambled → 6 shingles, 0 shared → clean
    // doc 3: 4 words → 0 shingles → n_total 0, bp 0 → clean
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta word1 word2 word3 word4"),
      (2L, "zeta epsilon delta gamma beta alpha word1 word2 word3 word4"),
      (3L, "tiny doc two words")).toDF("doc_id", "text")
    val out = DedupOps.contaminationScore(train, evalSet).orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 6L, 3333L, "contaminated"),
      (2L, 0L, 6L, 0L, "clean"),
      (3L, 0L, 0L, 0L, "clean")))
  }

  test("band edges are integer-exact (trace/partial boundary at 100 bp)") {
    import spark.implicits._
    // 104 distinct words → 100 distinct shingles; plant exactly one shared
    // 5-gram → 100 bp, which must land in 'partial' (trace is STRICTLY
    // below 1%), pinning the div-vs-float boundary behavior
    val evalWords = "e1 e2 e3 e4 e5"
    val filler = (1 to 99).map(i => s"w$i").mkString(" ")
    val train = Seq((1L, s"$evalWords $filler")).toDF("doc_id", "text")
    val evalSet = Seq((100L, evalWords)).toDF("doc_id", "text")
    val out = DedupOps.contaminationScore(train, evalSet)
      .as[(Long, Long, Long, Long, String)].collect().head
    assert(out == ((1L, 1L, 100L, 100L, "partial")))
  }

  test("q57 agrees with q40 on the shared columns; totals bound the overlap") {
    val score = DedupOps.q57ContaminationScore(spark, sf)
    val keep = DedupOps.q40Decontaminate(spark, sf)
    val joined = score.alias("s").join(keep.alias("k"), Seq("doc_id")).cache()
    try {
      assert(joined.filter(col("s.n_shared") =!= col("k.n_shared")).count() == 0)
      assert(joined.filter(col("k.keep") =!= (col("s.overlap_bp") === 0)).count() == 0)
      assert(joined.filter(col("s.n_shared") > col("s.n_total")).count() == 0)
      assert(score.filter(col("band") =!= "clean").count() > 0,
        "corpus has planted near-dups; some contamination expected")
    } finally { joined.unpersist(); () }
  }

  test("plan shape: broadcast semi-probe, and the denominator is a projection (no third explode)") {
    val qe = DedupOps.q57ContaminationScore(spark, sf).queryExecution
    val plan = qe.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // count REAL join/generate nodes, not substrings of the serialized
    // tree: when another suite leaves a shared frame cached, the subtree
    // renders as an InMemoryTableScan whose *string* carries its own
    // "Generate" lines (round-10 order-dependent flake) — node collection
    // over the pre-AQE physical plan sees only this query's operators
    val joins = qe.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.CartesianProductExec => j
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }
    assert(joins.isEmpty, qe.sparkPlan.toString)
    // one Generate for the train shingles, one for the eval side — the
    // n_total denominator must come from size() inline on the scan
    val generates = qe.sparkPlan.collect {
      case g: org.apache.spark.sql.execution.GenerateExec => g }
    assert(generates.size <= 2, qe.sparkPlan.toString)
  }
}
