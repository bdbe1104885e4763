package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape pins for the round-20 operators — the 100 TB contracts
  * each scaladoc states, held by the optimizer output: q204 serves
  * selective access from the EMBEDDED seek table with exactly the one
  * corpus-construction group-by (no standing-index join, no extra
  * exchange vs the q195 write path it reads), q201's filter-chain
  * arms stay a per-row container walk with zero exchanges before the
  * output sort, and dictionary training adds NO plan cost to q195
  * (it rides inside the existing group-by's map function).
  */
class Round20PlanSpec extends AnyFunSuite {

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
      .collect { case s: ShuffleExchangeExec => s }
      .count(_.outputPartitioning.toString.toLowerCase.contains("hash"))

  test("q204: embedded-index selective access costs exactly the one " +
    "corpus-construction group-by — no standing-index join, no " +
    "second exchange for the fetch") {
    val df = WarcOps.q204SeekableFetch(spark, sf)
    df.collect()
    noCartesian(df)
    assert(hashExchanges(df) <= 1,
      s"q204 expects only the archive group-by:\n${plan(df)}")
    // and no join at all: the seek table rides in the shard tail
    val joins = deep(plan(df)).collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.isEmpty, s"q204 must not join:\n${plan(df)}")
  }

  test("q201 with filter-chain arms: still a per-row container walk, " +
    "ZERO exchanges before the output sort") {
    val df = TarOps.q201TarXz(spark, sf)
    df.collect()
    noCartesian(df)
    assert(hashExchanges(df) == 0,
      s"q201 must not shuffle before its sort:\n${plan(df)}")
  }

  test("q195 with dictionary training: plan shape UNCHANGED from the " +
    "round-19 pin (training rides inside the group-by's map)") {
    val df = WarcOps.q195WarcZstWrite(spark, sf)
    df.collect()
    noCartesian(df)
    val bcast = deep(plan(df)).collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }
    assert(bcast.nonEmpty, s"ratio flags must broadcast:\n${plan(df)}")
    assert(hashExchanges(df) <= 2,
      s"q195 expects the archive group-by (cached twice) only:\n${plan(df)}")
  }
}
