package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape pins for the round-18 operators — the 100 TB contracts
  * each scaladoc states, held by the optimizer output: the dict-bearing
  * q186 keeps q185's per-row archive walk, q187's pairing stays a
  * digest equi-join, the q188–q191 extractors stay per-row codec walks
  * with at most their corpus-construction exchange before the output
  * sort, and q189 adds only the archive group-by the WET twin has.
  */
class Round18PlanSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark
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

  private def hashExchanges(df: DataFrame): Int =
    deep(plan(df))
      .collect { case s: ShuffleExchangeExec
        // input-widening repartitions (Tables.widen / WarcOps.widenRecords,
        // r21 guide-2.5 unsplittable-input repair) are deliberate and
        // scale-conditional; the pin guards exchanges the OPERATOR induces
        if !Seq(org.apache.spark.sql.execution.exchange.REPARTITION_BY_COL,
            org.apache.spark.sql.execution.exchange.REPARTITION_BY_NUM)
          .contains(s.shuffleOrigin) => s }
      .count(_.outputPartitioning.toString.toLowerCase.contains("hash"))

  test("q186: the dictionary frame adds NO plan weight — q185's shape " +
    "(one corpus-construction group-by, per-row walk) exactly") {
    val df = WarcOps.q186WarcZstDictExtract(spark, sf)
    df.collect()
    noCartesian(df)
    assert(hashExchanges(df) <= 1,
      s"q186 expects only the archive group-by:\n${plan(df)}")
  }

  test("q187: sample-grain audio pairing is a digest EQUI-join — never " +
    "cartesian/BNLJ (the q183 bound at the PCM grain)") {
    val df = AudioDedupOps.q187PcmNearDup(spark, sf)
    df.collect()
    noCartesian(df)
  }

  test("q188: the XLSX extractor is a per-row container walk — no " +
    "exchange before the output sort") {
    val df = XlsxOps.q188XlsxExtract(spark, sf)
    df.collect()
    noCartesian(df)
    assert(hashExchanges(df) == 0,
      s"per-row walker must not exchange:\n${plan(df)}")
  }

  test("q189: the WAT loop costs exactly the archive group-by (the q148 " +
    "WET shape) — extraction, to_json, walk, from_json all per-row") {
    val df = WatOps.q189WatRoundtrip(spark, sf)
    df.collect()
    noCartesian(df)
    assert(hashExchanges(df) <= 1,
      s"q189 expects only the archive group-by:\n${plan(df)}")
  }

  test("q192: CDX fetch over .warc.zst is index-read + ONE extent join " +
    "— the archive group-by, the output-sized extent rollup, their " +
    "equi-join; never cartesian") {
    val df = CdxOps.q192CdxZstFetch(spark, sf)
    df.collect()
    noCartesian(df)
    assert(hashExchanges(df) <= 3,
      s"archive build + extent rollup + join at most:\n${plan(df)}")
  }

  test("q190: legacy PNG decode is a per-row codec walk — no exchange " +
    "before the output sort") {
    val df = MultimodalOps.q190PngLegacyDecode(spark, sf)
    df.collect()
    noCartesian(df)
    assert(hashExchanges(df) == 0,
      s"per-row walker must not exchange:\n${plan(df)}")
  }

  test("q191: compressed-TIFF decode is a per-row codec walk — no " +
    "exchange before the output sort") {
    val df = TiffOps.q191TiffCompressed(spark, sf)
    df.collect()
    noCartesian(df)
    assert(hashExchanges(df) == 0,
      s"per-row walker must not exchange:\n${plan(df)}")
  }

  test("q193: PNG depth-form decode is a per-row codec walk — no " +
    "exchange before the output sort") {
    val df = MultimodalOps.q193PngDepthDecode(spark, sf)
    df.collect()
    noCartesian(df)
    assert(hashExchanges(df) == 0,
      s"per-row walker must not exchange:\n${plan(df)}")
  }
}
