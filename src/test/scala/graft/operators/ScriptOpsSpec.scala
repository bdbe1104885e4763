package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Script detection: real Unicode-script classes count correctly,
  * dominance flips with the planted runs, tie-breaks are alphabetical,
  * and the Latin share is integer arithmetic.
  */
class ScriptOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("script classes count the right codepoints") {
    import spark.implicits._
    val r = Seq(("abcABC один два 漢字簡體 شمس ش 123 .,!", 1L))
      .toDF("s", "id")
      .select(
        ScriptOps.scriptCount(col("s"), "Latin").as("lat"),
        ScriptOps.scriptCount(col("s"), "Cyrillic").as("cyr"),
        ScriptOps.scriptCount(col("s"), "Han").as("han"),
        ScriptOps.scriptCount(col("s"), "Arabic").as("ar"))
      .collect().head
    assert(r.getAs[Long]("lat") == 6L)
    assert(r.getAs[Long]("cyr") == 7L) // один(4) + два(3)
    assert(r.getAs[Long]("han") == 4L)
    assert(r.getAs[Long]("ar") == 4L) // شمس(3) + ش(1)
    // digits and punctuation are Common script: counted by nobody
  }

  test("q157 on sf0.001: counts match arithmetic, dominance flips, pct is integer") {
    val rows = ScriptOps.q157ScriptDetect(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_han") == (id % 5) * 120)
      assert(r.getAs[Long]("n_cyrillic") == id % 20)
      assert(r.getAs[Long]("n_arabic") == id % 10)
      val counts = Map(
        "arabic" -> r.getAs[Long]("n_arabic"),
        "cyrillic" -> r.getAs[Long]("n_cyrillic"),
        "han" -> r.getAs[Long]("n_han"),
        "latin" -> r.getAs[Long]("n_latin"))
      val best = counts.toSeq.sortBy { case (k, v) => (-v, k) }.head._1
      assert(r.getAs[String]("dominant") == best, s"doc $id")
      val total = counts.values.sum.max(1L)
      assert(r.getAs[Long]("latin_pct") == counts("latin") * 100 / total)
    }
    // the planted Han runs must actually flip dominance somewhere
    assert(rows.exists(_.getAs[String]("dominant") == "han"))
    assert(rows.exists(_.getAs[String]("dominant") == "latin"))
  }
}
