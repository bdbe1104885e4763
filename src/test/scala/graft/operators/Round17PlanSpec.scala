package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape pins for the round-17 operators — the 100 TB contracts
  * each scaladoc states, held by the optimizer output: q180's model
  * stays a fixed-size broadcast with per-doc verdicts never cartesian,
  * q181 stays a per-row codec walk, q182's dimensions broadcast around
  * one per-host window, q183's pairing is a digest equi-join, q184 is
  * one output-sized rollup, and the brotli-bearing q139 keeps its
  * per-row shape.
  */
class Round17PlanSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(df: DataFrame) = graft.SparkTestSession.finalPlan(df)

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

  test("q180: the 12-language model still BROADCASTS into scoring; the " +
    "Laplace scaffold is the one documented BNLJ; abstention adds no " +
    "corpus-grain join") {
    val df = LangIdOps.q180LangIdUnd(spark, sf)
    df.collect()
    val nodes = deep(plan(df))
    assert(nodes.collect { case j: CartesianProductExec => j }.isEmpty,
      s"cartesian in plan:\n${plan(df)}")
    val bnlj = nodes.collect { case j: BroadcastNestedLoopJoinExec => j }
    assert(bnlj.size == 1 && bnlj.head.toString.contains("bucket"),
      s"only the bounded lang×bucket scaffold may BNLJ:\n${plan(df)}")
    assert(nodes.collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
      s"scoring must join the broadcast model:\n${plan(df)}")
  }

  test("q181: the CID corpus is still a per-row codec walk — only the " +
    "corpus exchange before the output sort") {
    val df = PdfOps.q181PdfCidExtract(spark, sf)
    df.collect()
    noCartesian(df)
    val nonSort = deep(plan(df))
      .collect { case s: ShuffleExchangeExec
        // input-widening repartitions (Tables.widen / WarcOps.widenRecords,
        // r21 guide-2.5 unsplittable-input repair) are deliberate and
        // scale-conditional; the pin guards exchanges the OPERATOR induces
        if !Seq(org.apache.spark.sql.execution.exchange.REPARTITION_BY_COL,
            org.apache.spark.sql.execution.exchange.REPARTITION_BY_NUM)
          .contains(s.shuffleOrigin) => s }
      .filterNot(_.outputPartitioning.toString.toLowerCase.contains("range"))
    assert(nonSort.size <= 1,
      s"per-row walker plans ${nonSort.size} non-sort exchanges:\n${plan(df)}")
  }

  test("q182: timed politeness keeps q154's shape — host dimensions " +
    "broadcast, one per-host ranking window, never cartesian") {
    val df = FrontierOps.q182FrontierTiming(spark, sf)
    df.collect()
    noCartesian(df)
    val nodes = deep(plan(df))
    assert(nodes.collect { case j: BroadcastHashJoinExec => j }.size >= 2,
      s"rules + freshness dims must broadcast:\n${plan(df)}")
    val hashEx = nodes
      .collect { case s: ShuffleExchangeExec
        // input-widening repartitions (Tables.widen / WarcOps.widenRecords,
        // r21 guide-2.5 unsplittable-input repair) are deliberate and
        // scale-conditional; the pin guards exchanges the OPERATOR induces
        if !Seq(org.apache.spark.sql.execution.exchange.REPARTITION_BY_COL,
            org.apache.spark.sql.execution.exchange.REPARTITION_BY_NUM)
          .contains(s.shuffleOrigin) => s }
      .filter(_.outputPartitioning.toString.toLowerCase.contains("hash"))
    // the per-host ranking window plus the two |hosts|-sized dimension
    // builds (rules distinct + freshness group-by) — never a
    // corpus-grain join exchange
    assert(hashEx.size <= 3,
      s"only the window and host-dim builds may exchange:\n${plan(df)}")
  }

  test("q183: the audio pairing is a digest EQUI-join — never " +
    "cartesian/BNLJ") {
    val df = AudioDedupOps.q183AudioNearDup(spark, sf)
    df.collect()
    noCartesian(df)
  }

  test("q184: loss accounting is ONE output-sized rollup") {
    val df = WarcOps.q184CodingReport(spark, sf)
    df.collect()
    noCartesian(df)
    val hashEx = deep(plan(df))
      .collect { case s: ShuffleExchangeExec
        // input-widening repartitions (Tables.widen / WarcOps.widenRecords,
        // r21 guide-2.5 unsplittable-input repair) are deliberate and
        // scale-conditional; the pin guards exchanges the OPERATOR induces
        if !Seq(org.apache.spark.sql.execution.exchange.REPARTITION_BY_COL,
            org.apache.spark.sql.execution.exchange.REPARTITION_BY_NUM)
          .contains(s.shuffleOrigin) => s }
      .filter(_.outputPartitioning.toString.toLowerCase.contains("hash"))
    assert(hashEx.size <= 2, // archive group-by + the enc rollup
      s"expected the corpus group-by + one rollup:\n${plan(df)}")
  }

  test("q139 with the brotli leg stays a per-row chain over the archive " +
    "group-by") {
    val df = WarcOps.q139WarcHttpExtract(spark, sf)
    df.collect()
    noCartesian(df)
    val hashEx = deep(plan(df))
      .collect { case s: ShuffleExchangeExec
        // input-widening repartitions (Tables.widen / WarcOps.widenRecords,
        // r21 guide-2.5 unsplittable-input repair) are deliberate and
        // scale-conditional; the pin guards exchanges the OPERATOR induces
        if !Seq(org.apache.spark.sql.execution.exchange.REPARTITION_BY_COL,
            org.apache.spark.sql.execution.exchange.REPARTITION_BY_NUM)
          .contains(s.shuffleOrigin) => s }
      .filter(_.outputPartitioning.toString.toLowerCase.contains("hash"))
    assert(hashEx.size <= 1,
      s"q139 expects only the corpus-construction group-by:\n${plan(df)}")
  }
}
