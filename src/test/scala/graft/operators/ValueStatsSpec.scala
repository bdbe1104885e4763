package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q34's histogram-based exact quantiles: bit-parity with Spark's builtin
  * `median`/`percentile` aggregates (the formula the oracle already
  * hash-matches), and the scale-shape pin — no Sort/Window over the raw
  * event stream, only over histogram rows.
  */
class ValueStatsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("histogram quantiles are bit-identical to the builtin percentile aggregates") {
    val got = RelationalOps.q34ValueStats(spark, sf).collect()
    val ref = graft.Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        min(col("value")).as("min_v"),
        max(col("value")).as("max_v"),
        median(col("value")).as("med_v"),
        percentile(col("value"), lit(0.9)).as("p90_v"))
      .orderBy(col("event_type"))
      .collect()
    assert(got.length == ref.length && got.nonEmpty)
    for ((g, r) <- got.zip(ref)) {
      assert(g.getString(0) == r.getString(0))
      assert(g.getLong(1) == r.getLong(1))
      assert(g.getDouble(2) == r.getDouble(2) && g.getDouble(3) == r.getDouble(3))
      // bit-for-bit, not approximately: the oracle hash-compares these
      assert(java.lang.Double.doubleToLongBits(g.getDouble(4)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(4)),
        s"${g.getString(0)} median ${g.getDouble(4)} != ${r.getDouble(4)}")
      assert(java.lang.Double.doubleToLongBits(g.getDouble(5)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(5)),
        s"${g.getString(0)} p90 ${g.getDouble(5)} != ${r.getDouble(5)}")
    }
  }

  test("interpolation brackets: a two-value group hits both branches") {
    import spark.implicits._
    // n=2: pos(0.5)=0.5 -> interpolate between the two values;
    // n=3: pos(0.5)=1.0 -> lower==higher -> exact middle value
    val ref = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 3.0), ("b", 10.0))
      .toDF("event_type", "value")
    // reuse the operator's internals by running the same shape inline via
    // the builtin reference on the same frame
    val builtin = ref.groupBy(col("event_type"))
      .agg(median(col("value")).as("med_v"), percentile(col("value"), lit(0.9)).as("p90_v"))
      .orderBy("event_type").collect()
    assert(builtin(0).getDouble(1) == 1.5 && builtin(1).getDouble(1) == 3.0)
    // p90 of [1,2]: pos=0.9 -> 0.1*1 + 0.9*2 = 1.9
    assert(math.abs(builtin(0).getDouble(2) - 1.9) < 1e-12)
  }

  test("NULL values are ignored, matching the builtin aggregates") {
    import spark.implicits._
    // the parquet corpus can't exercise this (value is non-nullable by
    // construction) — plant NULLs and prove the histogram skips them the
    // way median/percentile (and the DuckDB quantile_cont oracle) do
    val ref = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)),
      ("b", Some(5.0)), ("b", None), ("b", None))
      .toDF("event_type", "value")
    val got = RelationalOps.valueStats(ref).collect()
    val builtin = ref.groupBy(col("event_type"))
      .agg(count(col("value")).as("n"), median(col("value")).as("med_v"),
        percentile(col("value"), lit(0.9)).as("p90_v"))
      .orderBy("event_type").collect()
    assert(got.length == 2)
    for ((g, b) <- got.zip(builtin)) {
      assert(g.getString(0) == b.getString(0))
      // n counts non-NULL values only (2 for "a", 1 for "b")
      assert(g.getLong(1) == b.getLong(1), s"${g.getString(0)} n=${g.getLong(1)}")
      assert(java.lang.Double.doubleToLongBits(g.getDouble(4)) ==
        java.lang.Double.doubleToLongBits(b.getDouble(2)))
      assert(java.lang.Double.doubleToLongBits(g.getDouble(5)) ==
        java.lang.Double.doubleToLongBits(b.getDouble(3)))
    }
  }

  test("plan shape: no Sort/Window over the raw event stream") {
    val nodes = SparkTestSession.finalPlan(RelationalOps.q34ValueStats(spark, sf))
      .collect {
        case s: org.apache.spark.sql.execution.SortExec => s
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
    assert(nodes.nonEmpty)
    for (node <- nodes) {
      val aggsBelow = node.collect {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a }
      assert(aggsBelow.nonEmpty,
        s"${node.nodeName} runs over the raw row stream:\n$node")
    }
    // and no TypedImperativeAggregate buffering whole groups: the builtin
    // percentile/median must not appear anywhere in the plan
    val plan = RelationalOps.q34ValueStats(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("percentile") && !plan.contains("median"), plan)
  }
}
