package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** SVG extraction: decoy elision (comments/script/style), the viewBox
  * dimension fallback, tag-prefix census discipline, entity folding in
  * text runs, and hostility.
  */
class SvgOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("round trip: both dimension forms, census, title, text") {
    val even = SvgOps.extractSvg(4L, SvgOps.buildSvg(4L, "a b c d"))
    assert(even.width == 104 && even.height == 84)
    assert(even.n_paths == 1 && even.n_rects == 1 && even.n_circles == 1)
    assert(even.n_texts == 2)
    assert(even.title == "Fig № 4")
    assert(even.text == "a b c d\nLabel &4 <end>")
    val odd = SvgOps.extractSvg(5L, SvgOps.buildSvg(5L, "x y"))
    assert(odd.width == 105 && odd.height == 85, "viewBox fallback")
  }

  test("decoys never leak: comment/script/style text and elements invisible") {
    val svg = SvgOps.buildSvg(2L, "w1 w2")
    val info = SvgOps.extractSvg(2L, svg)
    assert(!info.text.contains("nope") && !info.text.contains("never"))
    // the decoy <path/> in the comment and <circle/> in the style
    // must not count
    assert(info.n_paths == 3 && info.n_circles == 1)
  }

  test("census counts element boundaries, not tag prefixes") {
    val svg = "<svg width=\"10\" height=\"10\">" +
      "<textPath href=\"#p\">curved</textPath><text>real</text></svg>"
    val info = SvgOps.extractSvg(1L, svg)
    assert(info.n_texts == 1)
    assert(info.text == "real")
  }

  test("hostility: truncations and non-svg input never throw") {
    val svg = SvgOps.buildSvg(7L, "p q r")
    for (cut <- 0 to svg.length by 11)
      SvgOps.extractSvg(7L, svg.take(cut)) // must not throw
    assert(SvgOps.extractSvg(7L, "not markup").width == -1)
    assert(SvgOps.extractSvg(7L, "<svg").width == -1 ||
      SvgOps.extractSvg(7L, "<svg").n_texts == 0)
  }

  test("q177 on sf0.001: every document round-trips") {
    val rows = SvgOps.q177SvgExtract(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == 100 + id % 300)
      assert(r.getLong(6) == 2L)
      assert(r.getString(7) == s"Fig № $id")
    }
  }
}
