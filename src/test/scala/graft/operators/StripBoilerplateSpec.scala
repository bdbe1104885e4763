package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Repeated-span removal (round-10 brief item 6): q61's frequent-shingle
  * detection turned into redaction. Hand-corpus semantics, exact
  * consistency with the coverage metric, and the scale-shape plan pin.
  */
class StripBoilerplateSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def sha(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("template spans strip; organic text survives; reassembly is order-preserving") {
    import spark.implicits._
    // 10 copies of a 5-token template: its 3 shingles have df 10..11 of 13
    // docs (>= 50% threshold). One doc embeds the template mid-sentence;
    // one is fully organic; one is too short to shingle.
    val docs = ((0 until 10).map(i => (i.toLong, "a b c d e")) ++ Seq(
      (100L, "p q r a b c d e s t u"),
      (200L, "totally organic text with unique words"),
      (300L, "xy"))).toDF("doc_id", "text")
    val out = TextOps.stripBoilerplate(docs, minDfBp = 5000L)
      .collect().map(r => r.getLong(0) -> r).toMap
    // template docs: every position covered -> empty remainder
    for (i <- 0 until 10) {
      assert(out(i.toLong).getLong(2) == 5, s"doc $i removed")
      assert(out(i.toLong).getString(3) == sha(""), s"doc $i kept_sha")
    }
    // embedded template: positions 3..7 ("a b c d e") covered, the
    // surrounding organic tokens survive IN ORDER
    assert(out(100L).getLong(2) == 5)
    assert(out(100L).getString(3) == sha("p q r s t u"))
    // organic doc and short doc: untouched (lowercased reassembly)
    assert(out(200L).getLong(2) == 0)
    assert(out(200L).getString(3) == sha("totally organic text with unique words"))
    assert(out(300L).getLong(2) == 0)
    assert(out(300L).getString(3) == sha("xy"))
  }

  test("removal counts equal q61's covered_tokens on real data") {
    val strip = TextOps.q70StripBoilerplate(spark, sf)
      .select(col("doc_id"), col("removed_tokens"))
    val coverage = TextOps.q61BoilerplateCoverage(spark, sf)
      .select(col("doc_id"), col("covered_tokens"))
    val diff = strip.join(coverage, Seq("doc_id"))
      .filter(col("removed_tokens") =!= col("covered_tokens"))
    assert(diff.count() == 0,
      s"strip and coverage disagree: ${diff.limit(3).collect().mkString(", ")}")
    assert(strip.filter(col("removed_tokens") > 0).count() > 0,
      "corpus has planted boilerplate; some removal expected")
  }

  test("plan shape: frequent set broadcasts, no cartesian/BNLJ, no window") {
    val plan = SparkTestSession.finalPlan(TextOps.q70StripBoilerplate(spark, sf))
    val bad = plan.collect {
      case j: org.apache.spark.sql.execution.joins.CartesianProductExec => j
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(bad.isEmpty, s"unexpected nodes: ${bad.map(_.nodeName)}")
    // the only BNLJ allowed is the 1-row n_docs count broadcast (q61's
    // declared shape); the shingle-match join must be a broadcast hash join
    val bnlj = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j }
    assert(bnlj.size <= 1, s"unexpected BNLJs:\n$plan")
    val bhj = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty, s"frequent-set match is not a broadcast hash join:\n$plan")
  }
}
