package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Code-quality signals: language routing across the three dialects,
  * shebang exclusion by subtraction, SPDX gate, line-length detector,
  * and the integer share arithmetic.
  */
class CodeOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("q165 on sf0.001: every signal matches the arithmetic") {
    val rows = CodeOps.q165CodeQuality(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val k = CodeOps.bodyLines(id)
      val lic = if (CodeOps.hasLicense(id)) 2 else 0
      val sh = if (CodeOps.hasShebang(id)) 1 else 0
      assert(r.getAs[String]("lang") == CodeOps.langOf(id), s"doc $id")
      assert(r.getAs[Long]("n_lines") == k + 1 + sh + lic)
      assert(r.getAs[Long]("n_comment") == (k + 2) / 3 + lic)
      assert(r.getAs[Long]("comment_pct") ==
        ((k + 2) / 3 + lic) * 100 / (k + 1 + sh + lic))
      assert(r.getAs[Long]("max_line_len") == 90 + id % 40)
      assert(r.getAs[Boolean]("has_license") == CodeOps.hasLicense(id))
      assert(r.getAs[Boolean]("has_shebang") == CodeOps.hasShebang(id))
    }
    // all three dialects and both shebang states actually occur
    assert(rows.map(_.getAs[String]("lang")).distinct.toSet ==
      Set("python", "scala", "sql"))
    assert(rows.exists(_.getAs[Boolean]("has_shebang")))
  }

  test("shebang is not a comment: a shebang-only python file counts zero") {
    assert(CodeOps.buildSource(6L).startsWith("#!/usr/bin/env python3"))
    // doc 6: python with shebang, no license (6%4!=0): comments = (k+2)/3 only
    val r = CodeOps.q165CodeQuality(spark, "/root/testdata/sf0.001")
      .filter("doc_id = 6").collect().head
    assert(r.getAs[Long]("n_comment") == (CodeOps.bodyLines(6L) + 2) / 3)
  }
}
