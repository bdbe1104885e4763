package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HTML → text extraction (round-14 brief item 2): hand-corpus
  * exactness for every rule in the chain, the injection-safety ordering
  * (decode AFTER strip), the declared unclosed-element fallback, and
  * hostile-markup fuzz (extraction never throws, is deterministic, and
  * never emits text that was inside an elided element).
  */
class HtmlOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def extract(html: String): Seq[String] = {
    import spark.implicits._
    Seq((1L, html)).toDF("doc_id", "html")
      .select(HtmlOps.htmlBlocks(col("html")).as("b"))
      .collect().head.getSeq[String](0).toSeq
  }

  test("block segmentation, tag stripping, and whitespace normalization") {
    val html = "<html><body><h1>Title</h1><p>one <b>two</b>   three</p>" +
      "<div><ul><li>a</li><li>b</li></ul></div>tail</body></html>"
    // inline <b> never splits a block; block tags do; empties drop
    assert(extract(html) == Seq("Title", "one two three", "a", "b", "tail"))
  }

  test("script/style/comments drop WITH content; raw < inside script cannot resurrect") {
    val html = "<p>keep</p><script>if (1 < 2) { document.write(\"<p>evil</p>\"); }" +
      "</script><style>p { color: red; } </style><!-- <p>ghost</p> --><p>also</p>"
    assert(extract(html) == Seq("keep", "also"))
  }

  test("entities decode after stripping: encoded markup stays literal, amp decodes last") {
    // &lt;script&gt; must NOT become an element; &amp;lt; is the literal &lt;
    val html = "<p>&lt;script&gt;alert(1)&lt;/script&gt;</p><p>&amp;lt; &amp;amp;</p>" +
      "<p>A&nbsp;B &quot;q&quot; &#39;v&#39; &apos;w&apos; &#34;x&#34; 1&lt;2&gt;0</p>"
    assert(extract(html) == Seq(
      "<script>alert(1)</script>", "&lt; &amp;",
      "A B \"q\" 'v' 'w' \"x\" 1<2>0"))
  }

  test("unclosed script keeps its text (content-preserving fallback, deterministic)") {
    val html = "<p>before</p><script>var x = 1;"
    assert(extract(html) == Seq("before", "var x = 1;"))
  }

  test("elision ORDER pin: script elides before comments, so the legacy " +
    "script-hiding idiom cannot swallow real text") {
    // a bare <!-- inside script whose --> lies OUTSIDE the element: a
    // comments-first pass would elide through </script><p>Real text</p>
    // and keep the script prefix instead (exactly backwards)
    val html = "<script>var a; <!-- hide() </script>" +
      "<p>Real text</p><!-- trailing -->"
    assert(extract(html) == Seq("Real text"))
    // the classic full idiom: comment markers wholly inside the element
    val idiom = "<p>keep</p><script><!--\nlegacy();\n//--></script><p>also</p>"
    assert(extract(idiom) == Seq("keep", "also"))
    // the declared converse trade: a comment holding a script open-tag
    // loses its interior to the script pass (rarer page shape;
    // deterministic). The orphaned '<!--' survives as literal text —
    // the block-tag pass newlines '<p>' before the generic strip can
    // see a '>' for it.
    val converse = "<!-- <script> -->text</script><p>tail</p>"
    assert(extract(converse) == Seq("<!--", "tail"))
  }

  test("case-insensitive tags and attribute soup") {
    val html = "<P CLASS=\"a\" data-x='<'>one</P><DIV\nid=z>two</DIV>" +
      "<SCRIPT type=\"text/javascript\">gone()</SCRIPT><BR/>three"
    // note data-x='<' — a '<' inside an attribute value; the simple
    // tag regex closes at the first '>', so the remainder "'>one" keeps
    // "one" after the dangling quote strips as a tag-less fragment:
    // declared determinism, pinned here
    assert(extract(html).contains("two"))
    assert(extract(html).last == "three")
    assert(!extract(html).exists(_.contains("gone")))
  }

  test("htmlBlockRows numbers surviving blocks in document order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "<p>a</p><p></p><p>b</p>"),
      (2L, "<div>c</div>")).toDF("doc_id", "html")
    val rows = HtmlOps.htmlBlockRows(docs).orderBy("doc_id", "block_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(rows == Seq((1L, 1L, "a"), (1L, 2L, "b"), (2L, 1L, "c")))
  }

  test("hostile-markup fuzz: never throws, deterministic, elided content never leaks") {
    import spark.implicits._
    val pieces = Array("<", ">", "<<p", "</", "<p", "<script>", "</script>",
      "<!--", "-->", "<style>", "&", "&amp;", "&#", "&lt;", "x", " ", "\n",
      "\"", "'", "=", "<div class=", "<br/>", "</p", "<h1>", "ELIDED")
    def soup(seed: Long): String = {
      var s = seed
      val sb = new StringBuilder
      for (_ <- 0 until 200) {
        s = s * 6364136223846793005L + 1442695040888963407L
        sb.append(pieces(((s >>> 33) % pieces.length).toInt))
      }
      sb.toString
    }
    // ELIDED appears only via the soup; wrap each soup in a closed script
    // element — the whole thing must vanish, whatever garbage is inside…
    val wrapped = (0 until 50).map(i =>
      (i.toLong, s"<p>ok$i</p><script>${soup(i).replace("</script>", "")}ELIDED</script>"))
    val out1 = wrapped.toDF("doc_id", "html")
      .select(col("doc_id"), HtmlOps.htmlBlocks(col("html")).as("b")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    out1.foreach { case (id, blocks) =>
      assert(blocks.head == s"ok$id", s"doc $id lost its real text")
      assert(!blocks.exists(_.contains("ELIDED")), s"doc $id leaked script content")
    }
    // …and raw soup (unclosable garbage) must not throw and must be
    // deterministic run-to-run
    val raw = (0 until 50).map(i => (i.toLong, soup(i * 31 + 7))).toDF("doc_id", "html")
    val a = raw.select(col("doc_id"), HtmlOps.htmlBlocks(col("html")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    val b = raw.select(col("doc_id"), HtmlOps.htmlBlocks(col("html")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    assert(a == b)
  }

  test("main-content selection: chrome drops, prose survives, both rules bind") {
    import spark.implicits._
    val blocks = Seq(
      (1L, 1L, "Home"),                                          // short nav
      (1L, 2L, "About Products Contact Careers Blog Legal More"), // long, stopword-poor
      (1L, 3L, "the quick brown fox jumps over a lazy dog and then " +
        "runs off to the river in the morning sun to rest"),      // prose: keep
      (1L, 4L, "the of a"),                                       // stopword-rich but short
      (2L, 1L, "copyright 2026 all rights reserved worldwide"))   // footer: no stopwords
      .toDF("doc_id", "block_idx", "block")
    val out = HtmlOps.mainContentBlocks(blocks, minStopBp = 200L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(5)).toMap
    assert(out((1L, 3L)), "prose must survive")
    assert(!out((1L, 1L)) && !out((1L, 2L)) && !out((1L, 4L)) && !out((2L, 1L)),
      s"chrome survived: $out")
  }

  /** The constant fifth block of the synthetic corpus after entity
    * decode: valid numeric references decode (é, em-dash, emoji,
    * numeric-encoded markup as LITERAL text), invalid ones (surrogate,
    * zero, beyond U+10FFFF) stay literal, and `&amp;#65;` is the
    * literal `&#65;` (amp-last).
    */
  private val EntityBlock =
    "Plusée — 😀 <i> <u> bad &#xD800; &#0; &#1114112; &#65; fin"

  test("q132 on sf0.001: the article body and the entity block survive the structural filter") {
    val rows = HtmlOps.q132MainContent(spark, "/root/testdata/sf0.001").collect()
    val texts = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def sha(s: String): String =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == 5L)
      assert(r.getLong(2) == 2L, s"doc ${r.getLong(0)}: ${r.getLong(2)} blocks kept")
      assert(r.getString(3) == sha(texts(r.getLong(0)) + "\n" + EntityBlock),
        s"doc ${r.getLong(0)}: kept content is not body + entity block")
    }
  }

  test("q122 shape on sf0.001: 5 blocks per doc, first is the title, last the decoded entity block") {
    val rows = HtmlOps.q122HtmlExtract(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == 5L, s"doc ${r.getLong(0)}: ${r.getLong(1)} blocks")
      assert(r.getString(4) == s"Doc ${r.getLong(0)}")
    }
    // pin the decoded entity block exactly once via the full chain
    import spark.implicits._
    val blocks = Seq((1L, "<div>Plus&#233;e &#8212; &#x1F600; &#60;i&#62; " +
      "&#x3C;u&#x3E; bad &#xD800; &#0; &#1114112; &amp;#65; fin</div>"))
      .toDF("doc_id", "html")
      .select(HtmlOps.htmlBlocks(col("html")).as("b"))
      .collect().head.getSeq[String](0)
    assert(blocks == Seq(EntityBlock), s"got: ${blocks.mkString("|")}")
  }
}
