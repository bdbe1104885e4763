package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape pins for the round-16 operators — the 100 TB contracts
  * each scaladoc states, held by the optimizer output: the VP8
  * extension queries stay per-row walks, q170's fixed-size model
  * BROADCASTS into the scoring join, q171's pairing is a digest
  * equi-join (never cartesian), and q172's range-read reconstruction
  * adds no exchange beyond q135's corpus-construction group-by.
  */
class Round16PlanSpec extends AnyFunSuite {

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

  test("q168/q169 are per-row codec walks: only the corpus repartition " +
    "exchanges before the final sort (the q138 shape)") {
    for (df <- Seq(
      MultimodalOps.q168Vp8Bpred(spark, sf),
      MultimodalOps.q169Vp8LoopFilter(spark, sf))) {
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
  }

  test("q170: the fixed-size model BROADCASTS into scoring; no shuffle join " +
    "ever carries the corpus against the model") {
    val df = LangIdOps.q170LangId(spark, sf)
    df.collect()
    val nodes0 = deep(plan(df))
    // the ONE documented cross: the Laplace scaffold `langs × buckets`,
    // bounded at 6 × 4096 rows regardless of corpus size (the q126
    // documented-BNLJ discipline); nothing else may go non-equi
    assert(nodes0.collect { case j: CartesianProductExec => j }.isEmpty,
      s"cartesian in plan:\n${plan(df)}")
    val bnlj = nodes0.collect { case j: BroadcastNestedLoopJoinExec => j }
    assert(bnlj.size == 1 && bnlj.head.toString.contains("bucket"),
      s"only the bounded lang×bucket scaffold may BNLJ:\n${plan(df)}")
    val nodes = nodes0
    assert(nodes.collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
      s"scoring must join the broadcast model:\n${plan(df)}")
    // the corpus side never sort-merge-joins against model-sized state
    // (the model is bounded at 6×4096 rows regardless of corpus size;
    // training's own tiny lang×bucket scaffolding may shuffle freely)
    val smj = nodes.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(smj.forall(j => !j.toString.contains("true_lang")),
      s"corpus-side sort-merge join against the model:\n${plan(df)}")
  }

  test("q171: the pairing is a digest EQUI-join — never cartesian/BNLJ") {
    val df = Mp4Ops.q171Mp4NearDup(spark, sf)
    df.collect()
    noCartesian(df)
  }

  test("q174/q175/q177 are per-row chains: at most the corpus repartition " +
    "exchanges before the final sort") {
    for (df <- Seq(
      OggOps.q174OggExtract(spark, sf),
      TabularOps.q175CsvRoundTrip(spark, sf),
      SvgOps.q177SvgExtract(spark, sf))) {
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
        s"per-row chain plans ${nonSort.size} non-sort exchanges:\n${plan(df)}")
    }
  }

  test("q176/q178 aggregate exactly once: the shard/rollup group-by is the " +
    "only hash exchange") {
    for (df <- Seq(
      TarOps.q176WebdatasetExport(spark, sf),
      ReportOps.q178CorpusReport(spark, sf))) {
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
      assert(hashEx.size <= 2, // group-by (+ q176's shard window)
        s"expected one output-sized aggregation:\n${plan(df)}")
    }
  }

  test("q179: bounded-hop resolution is equi-joins only — never cartesian, " +
    "never an unbounded iteration") {
    val df = RedirectOps.q179RedirectResolve(spark, sf)
    df.collect()
    noCartesian(df)
    // exactly MaxHops join rounds reach the plan — the cap is structural
    val joins = deep(plan(df)).collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      case j: BroadcastHashJoinExec => j
    }
    assert(joins.size <= RedirectOps.MaxHops,
      s"more joins than the declared hop cap:\n${plan(df)}")
  }

  test("q172: range-read reconstruction exchanges only at archive " +
    "grain — the corpus-construction group-by plus the standing-index " +
    "extent rollup, joined per archive") {
    val df = CdxOps.q172CdxFetch(spark, sf)
    df.collect()
    noCartesian(df)
    // two hash exchanges, both keyed group_id (one archive row each):
    // the synthetic-archive build and the cdx-<fp> artifact's
    // per-archive extent collect_list; the join between them is
    // archive-grain too, never record-grain
    val hashEx = deep(plan(df))
      .collect { case s: ShuffleExchangeExec
        // input-widening repartitions (Tables.widen / WarcOps.widenRecords,
        // r21 guide-2.5 unsplittable-input repair) are deliberate and
        // scale-conditional; the pin guards exchanges the OPERATOR induces
        if !Seq(org.apache.spark.sql.execution.exchange.REPARTITION_BY_COL,
            org.apache.spark.sql.execution.exchange.REPARTITION_BY_NUM)
          .contains(s.shuffleOrigin) => s }
      .filter(_.outputPartitioning.toString.toLowerCase.contains("hash"))
    assert(hashEx.size <= 2,
      s"q172 expects only the two archive-grain exchanges:\n${plan(df)}")
    assert(hashEx.forall(_.outputPartitioning.toString.contains("group_id")),
      s"q172 exchanges must be archive-grain (group_id):\n${plan(df)}")
  }
}
