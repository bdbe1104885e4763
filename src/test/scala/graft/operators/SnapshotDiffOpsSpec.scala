package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Snapshot diff: all four classes populated and mutually exclusive,
  * classification follows the period arithmetic, digests present
  * exactly where the URL exists.
  */
class SnapshotDiffOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private lazy val rows =
    SnapshotDiffOps.q158SnapshotDiff(spark, "/root/testdata/sf0.001").collect()

  test("every class is populated and follows the arithmetic") {
    val byStatus = rows.groupBy(_.getAs[String]("status")).view.mapValues(_.length)
    assert(Set("same", "changed", "gone", "new").subsetOf(byStatus.keys.toSet))
    rows.foreach { r =>
      val url = r.getAs[String]("url")
      val status = r.getAs[String]("status")
      if (url.startsWith("/new/")) assert(status == "new")
      else {
        val id = url.stripPrefix("/doc/").toLong
        val expect =
          if (id % 7 == 3) "gone"
          else if (id % 5 == 0) "changed"
          else "same"
        assert(status == expect, url)
      }
    }
  }

  test("digests exist exactly where the url exists in each snapshot") {
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("a_digest"), r.getAs[String]("b_digest"))
      r.getAs[String]("status") match {
        case "new" => assert(a.isEmpty && b.nonEmpty)
        case "gone" => assert(a.nonEmpty && b.isEmpty)
        case "same" => assert(a == b && a.nonEmpty)
        case "changed" => assert(a.nonEmpty && b.nonEmpty && a != b)
      }
    }
  }

  test("output is union-sized: |A| + |new|") {
    val nDocs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").count()
    val nNew = rows.count(_.getAs[String]("url").startsWith("/new/"))
    assert(rows.length == nDocs + nNew)
  }
}
