package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape pins for the round-15 operators — the 100 TB contracts
  * stated in each scaladoc, held by the optimizer output: the new
  * container/codec walkers are per-row (no exchange before the final
  * sort), q135's only aggregation is its corpus-construction group-by,
  * and q116's rework REALLY runs one corpus scan (the candidate-postings
  * exchange is reused, not recomputed).
  */
class Round15PlanSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(df: DataFrame) = graft.SparkTestSession.finalPlan(df)

  /** Collect across materialized AQE stages (leaves to collect()). */
  private def deep(p: SparkPlan): Seq[SparkPlan] = {
    val nodes = p.collect { case x => x }
    nodes ++ nodes.flatMap {
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        deep(s.plan)
      case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        deep(s.relation.cachedPlan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            a.executedPlan
          case x => x
        })
      case _ => Nil
    }
  }

  private def noCartesian(df: DataFrame): Unit = {
    val bad = deep(plan(df)).collect {
      case j: CartesianProductExec => j
      case j: BroadcastNestedLoopJoinExec => j
    }
    assert(bad.isEmpty, s"cartesian/BNLJ in plan:\n${plan(df)}")
  }

  test("q136/q137/q138 are per-row container walks: the ONLY exchange is the final sort") {
    for (df <- Seq(
      PdfOps.q136PdfExtract(spark, sf),
      Mp4Ops.q137Mp4Extract(spark, sf),
      MultimodalOps.q138Vp8Decode(spark, sf))) {
      df.collect() // materialize AQE stages
      val ex = deep(plan(df)).collect { case s: ShuffleExchangeExec => s }
      val nonSort = ex.filterNot(
        _.outputPartitioning.toString.toLowerCase.contains("range"))
      // q138 repartitions its corpus by doc_id before the per-row
      // decode (decode-where-the-bytes-are); everything else is sort-only
      assert(nonSort.size <= 1,
        s"per-row walker plans ${nonSort.size} non-sort exchanges:\n${plan(df)}")
      noCartesian(df)
    }
  }

  test("q135: gzip archives walk with no join anywhere — the only hash exchange " +
    "is the corpus-construction group-by") {
    val df = WarcOps.q135WarcGzExtract(spark, sf)
    df.collect()
    noCartesian(df)
    val hashEx = deep(plan(df))
      .collect { case s: ShuffleExchangeExec => s }
      .filter(_.outputPartitioning.toString.toLowerCase.contains("hash"))
    assert(hashEx.size == 1,
      s"q135 expects exactly the synthetic-archive group-by exchange:\n${plan(df)}")
  }

  test("q116 rework: ONE corpus token scan — the candidate-postings exchange is REUSED") {
    val df = SearchOps.q116DecontaminateRetrieval(spark, sf)
    df.collect()
    val nodes = deep(plan(df))
    val reused = nodes.collect { case r: ReusedExchangeExec => r }
    assert(reused.nonEmpty,
      s"df and postings must share the candidate-postings exchange:\n${plan(df)}")
    // documents.parquet feeds at most four scans: ONE full token scan
    // (shared by df AND postings via the reuse above — the load-bearing
    // pin), the corpus stats scan, and two eval-SLICE reads (the 5%
    // filter, pushed to the scan); a fifth means the rework regressed
    // to two full token passes
    val docScans = nodes.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
        if s.relation.location.rootPaths.exists(_.toString.contains("documents.parquet")) => s
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
        if s.toString.contains("documents") => s
    }
    assert(docScans.size <= 4,
      s"q116 reads documents ${docScans.size}x — the single-scan rework regressed:\n${plan(df)}")
  }
}
