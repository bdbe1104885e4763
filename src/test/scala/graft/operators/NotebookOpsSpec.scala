package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Notebook extraction: variant probes decode both source forms
  * identically, outputs never leak, counts follow the arithmetic,
  * hostile JSON never throws.
  */
class NotebookOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("q163 on sf0.001: counts and text match the arithmetic; wart form included") {
    val rows = NotebookOps.q163NotebookExtract(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val k = NotebookOps.nCells(id)
      assert(r.getAs[String]("language") == "python")
      assert(r.getAs[Long]("n_cells") == k)
      assert(r.getAs[Long]("n_code") == (k + 1) / 2)
      assert(r.getAs[Long]("n_markdown") == k / 2)
      val code = (0 until k).filter(_ % 2 == 0)
        .map(j => NotebookOps.codeText(id, j)).mkString
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(code.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(r.getAs[String]("code_sha") == sha, s"doc $id (wart=${id % 5 == 0})")
    }
    // both source forms are present in the corpus
    assert(rows.exists(_.getAs[Long]("doc_id") % 5 == 0))
    assert(rows.exists(_.getAs[Long]("doc_id") % 5 != 0))
  }

  test("outputs never leak into extracted text") {
    import spark.implicits._
    val nb = NotebookOps.buildNotebook(10L)
    assert(nb.contains("LEAK 10"))
    val texts = Seq((10L, nb)).toDF("doc_id", "nb")
      .select(
        array_join(transform(
          variant_get(parse_json(col("nb")), "$.cells", "array<variant>"),
          c => coalesce(
            array_join(try_variant_get(c, "$.source", "array<string>"), ""),
            try_variant_get(c, "$.source", "string"), lit(""))), "")
          .as("t"))
      .collect().head.getAs[String]("t")
    assert(!texts.contains("LEAK"))
    assert(texts.contains("import x_10"))
  }

  test("hostile JSON: malformed notebooks yield nulls, never a throw") {
    import spark.implicits._
    val rows = Seq((1L, "not json at all"), (2L, "{\"cells\": 42}"),
      (3L, "{}"), (4L, "{\"cells\":[{\"cell_type\":\"code\"}]}"))
      .toDF("doc_id", "nb")
      .select(col("doc_id"),
        try_variant_get(try_parse_json(col("nb")), "$.cells", "array<variant>")
          .as("cells"))
      .collect()
    assert(rows.length == 4)
    assert(rows.count(_.isNullAt(1)) >= 2)
  }
}
