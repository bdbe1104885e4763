package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SVG extraction — the web's vector images are XML, and a crawl
  * pipeline mines them two ways: structurally (dimensions, element
  * census — the icon-vs-figure signal) and textually (`<text>`/
  * `<tspan>` runs plus the `<title>`/`<desc>` accessibility strings
  * are REAL document text; `<script>`/`<style>` bodies and comments
  * are NOT and must never leak — the q122 HTML discipline applied to
  * the SVG namespace).
  *
  * Declared subset, all codegen-friendly string work per row:
  * dimensions from `width`/`height` attributes with the `viewBox`
  * fallback (the common authoring form); census over
  * path/rect/circle/text; text runs with entity folding via the
  * shared `ZipOps.xmlUnescape`; comments and script/style elided
  * FIRST so their decoy content can't reach any counter or the text.
  *
  * Scale shape (100 TB): one per-row `mapPartitions` pass, no
  * exchange before the output sort.
  */
object SvgOps {

  private[graft] final case class SvgInfo(
      doc_id: Long, width: Long, height: Long, n_paths: Int, n_rects: Int,
      n_circles: Int, n_texts: Int, title: String, text: String)

  private def stripRanges(s: String, open: String, close: String): String = {
    val sb = new StringBuilder
    var p = 0
    while (p < s.length) {
      val a = s.indexOf(open, p)
      if (a < 0) { sb.append(s.substring(p)); p = s.length }
      else {
        sb.append(s.substring(p, a))
        val b = s.indexOf(close, a + open.length)
        p = if (b < 0) s.length else b + close.length
      }
    }
    sb.toString
  }

  private def count(s: String, tag: String): Int = {
    var n = 0
    var p = s.indexOf("<" + tag, 0)
    while (p >= 0) {
      // a real element boundary, not a prefix (<textPath vs <text)
      val c = p + 1 + tag.length
      if (c >= s.length || !s.charAt(c).isLetter) n += 1
      p = s.indexOf("<" + tag, p + 1)
    }
    n
  }

  private def firstElemText(s: String, tag: String): String = {
    val a = s.indexOf("<" + tag)
    if (a < 0) return ""
    val gt = s.indexOf('>', a)
    val b = if (gt < 0) -1 else s.indexOf("</" + tag + ">", gt)
    if (gt < 0 || b < 0) "" else ZipOps.xmlUnescape(s.substring(gt + 1, b)).trim
  }

  private def attr(s: String, elemAt: Int, name: String): Option[String] = {
    val end = s.indexOf('>', elemAt)
    if (end < 0) return None
    val head = s.substring(elemAt, end)
    (name + "=\"([^\"]*)\"").r.findFirstMatchIn(head).map(_.group(1))
  }

  private[graft] def extractSvg(docId: Long, svg: String): SvgInfo = {
    // comments and script/style elide FIRST — their decoys must never
    // reach a counter, a dimension, or the text
    val noComments = stripRanges(svg, "<!--", "-->")
    val clean = stripRanges(
      stripRanges(noComments, "<script", "</script>"),
      "<style", "</style>")
    val svgAt = clean.indexOf("<svg")
    if (svgAt < 0) return SvgInfo(docId, -1, -1, 0, 0, 0, 0, "", "")
    def dim(name: String): Option[Long] =
      attr(clean, svgAt, name).flatMap(v =>
        "\\d+".r.findFirstIn(v).map(_.toLong))
    // width/height attributes, viewBox third/fourth numbers as fallback
    val vb = attr(clean, svgAt, "viewBox").map(v =>
      "[-\\d.]+".r.findAllIn(v).toSeq)
    val w = dim("width").orElse(vb.flatMap(_.lift(2)).map(_.toDouble.toLong))
      .getOrElse(-1L)
    val h = dim("height").orElse(vb.flatMap(_.lift(3)).map(_.toDouble.toLong))
      .getOrElse(-1L)
    // text runs: every <text>…</text> subtree's character data (tspan
    // tags inside strip like any markup), in document order
    val texts = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = clean.indexOf("<text")
    while (p >= 0) {
      val c = p + 5
      if (c < clean.length && !clean.charAt(c).isLetter) {
        val gt = clean.indexOf('>', p)
        val end = if (gt < 0) -1 else clean.indexOf("</text>", gt)
        if (gt >= 0 && end >= 0) {
          val inner = clean.substring(gt + 1, end)
          texts += ZipOps.xmlUnescape(
            inner.replaceAll("<[^>]*>", " ")).replaceAll("\\s+", " ").trim
        }
      }
      p = clean.indexOf("<text", p + 1)
    }
    SvgInfo(docId, w, h,
      count(clean, "path"), count(clean, "rect"), count(clean, "circle"),
      count(clean, "text"), firstElemText(clean, "title"),
      texts.mkString("\n"))
  }

  /** Deterministic SVG per document: viewBox-only dimensions on odd
    * ids (the fallback path), a census from doc_id arithmetic, a
    * multi-byte `<title>`, two text runs (one with a styled tspan and
    * entities), and decoys — a comment, a script body, and a style
    * body each carrying fake text/elements that must not leak.
    */
  private[graft] def buildSvg(id: Long, words: String): String = {
    val w = 100 + id % 300
    val h = 80 + id % 200
    val dims =
      if (id % 2 == 0) s"""width="${w}px" height="${h}px""""
      else s"""viewBox="0 0 $w $h""""
    val paths = (1 + id % 4).toInt
    val rects = (id % 3).toInt
    val circles = (1 + id % 2).toInt
    s"""<?xml version="1.0"?>
<svg xmlns="http://www.w3.org/2000/svg" $dims>
<title>Fig № $id</title>
<!-- decoy <text>never</text> <path/> w=9999 -->
<script>var t = "<text>nope</text>"; if (1 &lt; 2) {}</script>
<style>.a { content: "<circle/>"; }</style>
${Seq.fill(paths)("<path d=\"M0 0 L1 1\"/>").mkString}
${Seq.fill(rects)("<rect x=\"1\" y=\"1\" width=\"2\" height=\"2\"/>").mkString}
${Seq.fill(circles)("<circle cx=\"5\" cy=\"5\" r=\"2\"/>").mkString}
<text x="10" y="20">$words</text>
<text x="10" y="40">Label <tspan font-weight="bold">&amp;$id</tspan> &lt;end&gt;</text>
</svg>"""
  }

  /** q177: SVG end to end — build, elide decoys, census, dimensions
    * (attribute and viewBox forms both on the oracle path), title and
    * text-run extraction with entity folding; every column replayed
    * from (doc_id, text) arithmetic.
    */
  def q177SvgExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .repartition(col("doc_id"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) =>
        val words = t.split(" ").take(4).mkString(" ")
        extractSvg(id, buildSvg(id, words))
      })
      .toDF()
      .select(col("doc_id"), col("width"), col("height"),
        col("n_paths").cast("long").as("n_paths"),
        col("n_rects").cast("long").as("n_rects"),
        col("n_circles").cast("long").as("n_circles"),
        col("n_texts").cast("long").as("n_texts"),
        col("title"),
        sha2(col("text"), 256).as("text_sha"))
      .orderBy(col("doc_id"))
  }
}
