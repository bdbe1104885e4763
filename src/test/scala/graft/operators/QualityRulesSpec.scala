package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gopher-style quality rules (q75) and the duplicate-n-gram repetition
  * fraction (q76): hand-built boundary cases per rule, and plan hygiene.
  */
class QualityRulesSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("q75 rules: each gate trips on its own boundary case") {
    import spark.implicits._
    val pass = (1 to 45).map(i => s"word$i").mkString(" ") +
      " the of and extra tokens here"
    val docs = Seq(
      (1L, pass), // passes everything
      (2L, "too short but the of and"), // word count < 40
      (3L, (1 to 45).map(i => s"w$i").mkString(" ")), // no stopword kinds
      (4L, (1 to 45).map(_ => "12345").mkString(" ") + " the of") // alpha < 80%
    ).toDF("doc_id", "text")
    val out = TextOps.gopherQuality(docs)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(5) == 1, s"doc 1 should pass: ${out(1L)}")
    assert(out(2L).getInt(5) == 0 && out(2L).getLong(1) < 40L)
    assert(out(3L).getInt(5) == 0 && out(3L).getLong(4) < 2L)
    assert(out(4L).getInt(5) == 0 && out(4L).getLong(3) < 8000L)
    // exact integer arithmetic spot check on doc 2: 5 words, lengths
    // 3+5+3+3+2+3 -> wait: "too short but the of and" = 6 words, 19 chars
    val d2 = out(2L)
    assert(d2.getLong(1) == 6L)
    assert(d2.getLong(2) == (3 + 5 + 3 + 3 + 2 + 3) * 100L / 6L)
    assert(d2.getLong(3) == 10000L)
    assert(d2.getLong(4) == 3L) // the, of, and
  }

  test("q76 repetition: full-loop doc scores 10000 bp, organic 0, short 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c a b c a b c"), // every 3-gram occurrence duplicated
      (2L, "all these words appear only once here"),
      (3L, "xy zz") // < 3 words: zero grams
    ).toDF("doc_id", "text")
    val out = TextOps.dupNgramFraction(docs)
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 1: 7 grams, counts 3/2/2 -> all 7 occurrences duplicated
    assert(out(1L).getLong(1) == 7L && out(1L).getLong(2) == 7L
      && out(1L).getLong(3) == 10000L, out(1L).toString)
    assert(out(2L).getLong(2) == 0L && out(2L).getLong(3) == 0L)
    assert(out(3L).getLong(1) == 0L && out(3L).getLong(3) == 0L)
  }

  test("plans: q75 is a pure projection; q76 has no window and no cartesian") {
    val sf = "/root/testdata/sf0.001"
    val p75 = SparkTestSession.finalPlan(TextOps.q75GopherQuality(spark, sf))
    // no joins, no aggregates beyond none — a scan + project (+ the final
    // orderBy sort). Shuffle only for the output sort.
    val badNodes75 = p75.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(badNodes75.isEmpty, s"q75 unexpected nodes: ${badNodes75.map(_.nodeName)}")
    val p76 = SparkTestSession.finalPlan(TextOps.q76DupNgrams(spark, sf))
    val badNodes76 = p76.collect {
      case j: org.apache.spark.sql.execution.joins.CartesianProductExec => j
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(badNodes76.isEmpty, s"q76 unexpected nodes: ${badNodes76.map(_.nodeName)}")
  }
}
