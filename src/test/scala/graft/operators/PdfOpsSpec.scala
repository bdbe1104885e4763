package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** PDF text extraction: encode→decode round trip, escape classes,
  * dead-letter reasons (encrypted, bad xref, lying Length, corrupt
  * deflate), partial survival (a bad stream drops only its page), and
  * truncation fuzz (never a throw).
  */
class PdfOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def build(id: Long, a: String, b1: String, b2: String) =
    PdfOps.buildPdf(id, a, b1, b2)

  test("round trip: xref walk + flate + plain streams reassemble the exact text") {
    val out = PdfOps.extractPdf(7L, build(7L, "alpha beta", "gam", "ma delta"))
    assert(out.status == "ok")
    assert(out.n_pages == 2 && out.n_streams == 2)
    assert(out.text ==
      "Doc 7\nalpha beta\ngamma delta\nTail (7) \\ AB end\n" + PdfOps.FontLine)
  }

  test("string escapes: parens, backslash, octal, nesting") {
    assert(PdfOps.unescapePdfString("a\\(b\\)c") == "a(b)c")
    assert(PdfOps.unescapePdfString("x\\\\y") == "x\\y")
    assert(PdfOps.unescapePdfString("\\101\\102\\60") == "AB0")
    assert(PdfOps.unescapePdfString("tab\\there\\nnl") == "tab\there\nnl")
    // balanced parens nest WITHOUT escapes in a PDF string literal
    assert(PdfOps.contentText("BT (a (nested) b) Tj ET") == "a (nested) b")
    // a body with specials survives the escape→unescape loop
    val tricky = "p(q)r\\s"
    val rt = PdfOps.extractPdf(1L, build(1L, tricky, "", ""))
    assert(rt.status == "ok" && rt.text.contains(tricky))
  }

  test("line assembly: moves newline only after shown text; empty shows are neutral") {
    assert(PdfOps.contentText("BT 72 720 Td (a) Tj T* (b) Tj ET") == "a\nb")
    assert(PdfOps.contentText("BT 1 2 Td 3 4 TD (a) Tj ET") == "a",
      "leading moves must not open blank lines")
    assert(PdfOps.contentText("BT (a) Tj T* () Tj ET") == "a\n")
    assert(PdfOps.contentText("no text block here") == "")
  }

  test("dead letters: encrypted, not-pdf, bad xref, lying Length, corrupt deflate") {
    val good = build(3L, "one two", "thr", "ee")
    val s = new String(good, java.nio.charset.StandardCharsets.ISO_8859_1)
    // encrypted: plant /Encrypt in the trailer dict
    val enc = s.replace("trailer << /Size", "trailer << /Encrypt 99 0 R /Size")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(PdfOps.extractPdf(3L, enc).status == "encrypted")
    assert(PdfOps.extractPdf(3L, "hello".getBytes).status == "not-pdf")
    // bad startxref offset
    val badx = s.replaceAll("startxref\n\\d+", "startxref\n99999999")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(PdfOps.extractPdf(3L, badx).status == "bad-xref")
    // lying /Length on the flate stream (same byte width, so xref
    // offsets stay honest): that page drops, page 2 lives
    val lenM = "/Length (\\d+) /Filter".r.findFirstMatchIn(s).get
    val lieLen = "4".reverse.padTo(lenM.group(1).length, '0').reverse.mkString
    val lie = s.replaceFirst("/Length \\d+ /Filter", s"/Length $lieLen /Filter")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val lied = PdfOps.extractPdf(3L, lie)
    assert(lied.status == "bad-stream")
    assert(lied.text.contains("Tail (3)"), "page 2 must survive page 1's lie")
    // corrupt deflate byte: same partial-survival contract
    val streamAt = s.indexOf("stream\n", s.indexOf("FlateDecode")) + 7
    val flip = good.clone()
    flip(streamAt + 5) = (flip(streamAt + 5) ^ 0x5a).toByte
    val flipped = PdfOps.extractPdf(3L, flip)
    assert(flipped.status == "bad-stream")
    assert(flipped.text.contains("Tail (3)"))
  }

  test("truncation fuzz: every prefix parses to a typed status, never a throw") {
    val good = build(11L, "aa bb cc dd", "ee ", "ff")
    val statuses = Set("ok", "not-pdf", "bad-xref", "bad-structure", "bad-stream", "encrypted")
    for (cut <- 0 to good.length by 7) {
      val r = PdfOps.extractPdf(11L, good.take(cut))
      assert(statuses.contains(r.status), s"cut=$cut gave ${r.status}")
      if (cut < good.length) assert(r.status != "ok" || r.text.nonEmpty)
    }
    assert(PdfOps.extractPdf(11L, good).status == "ok")
    assert(PdfOps.extractPdf(11L, Array.empty[Byte]).status == "not-pdf")
  }

  test("PDF 1.5: xref STREAM + object STREAM resolve the identical document") {
    val v15 = PdfOps.extractPdf(9L, PdfOps.buildPdf15(9L, "one two three", "fou", "r five"))
    assert(v15.status == "ok", s"1.5 walk: ${v15.status}")
    assert(v15.n_pages == 2 && v15.n_streams == 2)
    assert(v15.text == "Doc 9\none two three\nfour five\nXRef (9) \\ AB end")
    // the 1.4 twin differs in the page-2 marker and carries the font line
    val v14 = PdfOps.extractPdf(9L, PdfOps.buildPdf(9L, "one two three", "fou", "r five"))
    assert(v15.text.replace("XRef", "Tail") + "\n" + PdfOps.FontLine == v14.text)
  }

  test("PDF 1.5 hostility: truncation fuzz never throws; a corrupt objstm is bad-structure") {
    val good = PdfOps.buildPdf15(21L, "aa bb cc", "dd", " ee")
    val statuses = Set("ok", "not-pdf", "bad-xref", "bad-structure", "bad-stream", "encrypted")
    for (cut <- 0 to good.length by 7) {
      val r = PdfOps.extractPdf(21L, good.take(cut))
      assert(statuses.contains(r.status), s"cut=$cut gave ${r.status}")
    }
    // flip a byte inside the object stream's deflate data: the packed
    // catalog/pages dicts become unreachable
    val s = new String(good, java.nio.charset.StandardCharsets.ISO_8859_1)
    val stmAt = s.indexOf("stream\n", s.indexOf("/ObjStm")) + 7
    val flip = good.clone()
    flip(stmAt + 4) = (flip(stmAt + 4) ^ 0x3c).toByte
    val r = PdfOps.extractPdf(21L, flip)
    assert(r.status == "bad-structure" || r.status == "bad-xref", r.status)
    // flip inside the XREF stream's deflate data: bad-xref
    val xAt = s.indexOf("stream\n", s.indexOf("/XRef")) + 7
    val flip2 = good.clone()
    flip2(xAt + 4) = (flip2(xAt + 4) ^ 0x3c).toByte
    assert(PdfOps.extractPdf(21L, flip2).status == "bad-xref")
  }

  test("font tables: ToUnicode wins over Differences; unmapped codes pass " +
    "through; CMap and Differences units") {
    assert(PdfOps.parseDifferences("<< /Differences [200 /eacute /Euro] >>")
      == Right(Map(200 -> "é", 201 -> "€")))
    assert(PdfOps.parseDifferences("<< /Differences [65 /uni0141] >>")
      == Right(Map(65 -> "Ł")))
    assert(PdfOps.parseDifferences("<< /Differences [65 /notaglyphname] >>")
      == Left("unsupported-glyph"))
    assert(PdfOps.parseToUnicode(
      "1 beginbfchar <41> <0042> endbfchar")
      == Right(PdfOps.FontMap(1, Map(0x41 -> "B"))))
    assert(PdfOps.parseToUnicode(
      "1 beginbfrange <41> <43> <0394> endbfrange")
      == Right(PdfOps.FontMap(1, Map(0x41 -> "Δ", 0x42 -> "Ε", 0x43 -> "Ζ"))))
    // surrogate-free multi-unit destinations concatenate
    assert(PdfOps.parseToUnicode(
      "1 beginbfchar <41> <00660066> endbfchar")
      == Right(PdfOps.FontMap(1, Map(0x41 -> "ff"))))
    // the single-byte ARRAY form maps element-wise
    assert(PdfOps.parseToUnicode(
      "1 beginbfrange <41> <43> [<0061> <0062> <0063>] endbfrange")
      == Right(PdfOps.FontMap(1, Map(0x41 -> "a", 0x42 -> "b", 0x43 -> "c"))))
  }

  test("CID CMaps: 2-byte codespace sets the width; wide bfchar, " +
    "contiguous + array bfrange; malformed shapes stay typed") {
    val cs = "1 begincodespacerange <0000> <FFFF> endcodespacerange "
    assert(PdfOps.parseToUnicode(
      cs + "1 beginbfchar <0300> <3042> endbfchar")
      == Right(PdfOps.FontMap(2, Map(0x300 -> "あ"))))
    assert(PdfOps.parseToUnicode(
      cs + "2 beginbfrange <0100> <0101> <4E00> " +
        "<0200> <0201> [<65E5> <672C>] endbfrange")
      == Right(PdfOps.FontMap(2, Map(0x100 -> "一", 0x101 -> "丁",
        0x200 -> "日", 0x201 -> "本"))))
    // width-inconsistent source codes dead-letter
    assert(PdfOps.parseToUnicode(
      cs + "1 beginbfchar <41> <0042> endbfchar") == Left("unsupported-cmap"))
    assert(PdfOps.parseToUnicode(
      "1 beginbfchar <4142> <0042> endbfchar") == Left("unsupported-cmap"))
    // mixed-width and >2-byte codespaces dead-letter
    assert(PdfOps.parseToUnicode(
      "1 begincodespacerange <00> <FFFF> endcodespacerange").isLeft)
    assert(PdfOps.parseToUnicode(
      "1 begincodespacerange <000000> <FFFFFF> endcodespacerange").isLeft)
    // an array whose length disagrees with its range dead-letters
    assert(PdfOps.parseToUnicode(
      cs + "1 beginbfrange <0100> <0102> [<0041> <0042>] endbfrange").isLeft)
    // a torn array form dead-letters
    assert(PdfOps.parseToUnicode(
      cs + "1 beginbfrange <0100> <0101> [<0041> endbfrange").isLeft)
    // decode: pairs big-endian, Identity fallback on unmapped codes,
    // odd byte count raises the bad bit
    val f = Map("F9" -> PdfOps.FontMap(2, Map(0x300 -> "あ")))
    assert(PdfOps.contentText("BT /F9 1 Tf <03000041> Tj ET", f) == "あA")
    val (t, bad) = PdfOps.contentTextChecked("BT /F9 1 Tf <030041> Tj ET", f)
    assert(t == "あ" && bad, "torn CID string must raise the bad bit")
  }

  test("unsupported font shapes dead-letter the DOCUMENT typed, never garbage") {
    val good = build(5L, "one two", "thr", "ee")
    val s = new String(good, java.nio.charset.StandardCharsets.ISO_8859_1)
    // swap the CMap's 1-byte codespace for a CID 2-byte one (same length)
    val cid = s.replace("<00> <FF>", "<0000FF> ") // same byte length
    val r = PdfOps.extractPdf(5L, cid.getBytes(
      java.nio.charset.StandardCharsets.ISO_8859_1))
    assert(r.status == "unsupported-cmap", r.status)
    assert(r.text.isEmpty)
    // unknown glyph name in /Differences (same byte length)
    val glyph = s.replace("/eacute", "/eacutX")
    val g = PdfOps.extractPdf(5L, glyph.getBytes(
      java.nio.charset.StandardCharsets.ISO_8859_1))
    assert(g.status == "unsupported-glyph", g.status)
  }

  test("hex strings decode through the current font; '<<' never misreads") {
    assert(PdfOps.contentText("BT <4142> Tj ET") == "AB")
    assert(PdfOps.contentText("BT <414> Tj ET") == "A@") // odd digit pads 0
    assert(PdfOps.contentText("BT (x) Tj <41 42> Tj ET") == "xAB")
    assert(PdfOps.contentText(
      "BT /F9 1 Tf <41> Tj ET", Map("F9" -> PdfOps.FontMap(1, Map(0x41 -> "Ω")))) == "Ω")
    // unmapped code under a mapped font passes through as Latin-1
    assert(PdfOps.contentText(
      "BT /F9 1 Tf <4142> Tj ET", Map("F9" -> PdfOps.FontMap(1, Map(0x41 -> "Ω")))) == "ΩB")
    // non-hex characters inside a hex literal: nothing shows AND the
    // bad-stream bit raises (error-as-value, never a silent drop)
    val (badText, badBit) = PdfOps.contentTextChecked("BT <41GZ> Tj ET")
    assert(badText == "" && badBit)
    assert(!PdfOps.contentTextChecked("BT <4142> Tj ET")._2)
  }

  test("CID round trip: the Identity-H Type0 font's 2-byte CMap " +
    "decodes the planted CJK line; the 1.4 twin is a strict prefix") {
    val cid = PdfOps.extractPdf(7L,
      PdfOps.buildPdfCid(7L, "alpha beta", "gam", "ma delta"))
    assert(cid.status == "ok", cid.status)
    assert(cid.n_pages == 2 && cid.n_streams == 2)
    val plain = PdfOps.extractPdf(7L,
      PdfOps.buildPdf(7L, "alpha beta", "gam", "ma delta"))
    assert(cid.text == plain.text + "\n" + PdfOps.CidLine)
  }

  test("q181 on sf0.001: the CID corpus round-trips ok with the CJK " +
    "line under every sha") {
    val rows = PdfOps.q181PdfCidExtract(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    val texts = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def sha(x: String) = java.security.MessageDigest.getInstance("SHA-256")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    rows.foreach { r =>
      assert(r.getString(1) == "ok")
      val ws = texts(r.getLong(0)).split(" ")
      val na = (ws.length + 1) / 2
      val expect = s"Doc ${r.getLong(0)}\n" + ws.take(na).mkString(" ") + "\n" +
        ws.drop(na).mkString(" ") + s"\nTail (${r.getLong(0)}) \\ AB end\n" +
        PdfOps.FontLine + "\n" + PdfOps.CidLine
      assert(r.getString(4) == sha(expect), s"doc ${r.getLong(0)} sha mismatch")
    }
  }

  test("q136 on sf0.001: every document round-trips ok with the derived text sha") {
    import org.apache.spark.sql.functions._
    val rows = PdfOps.q136PdfExtract(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    val texts = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def sha(x: String) = java.security.MessageDigest.getInstance("SHA-256")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    rows.foreach { r =>
      assert(r.getString(1) == "ok")
      assert(r.getLong(2) == 2L && r.getLong(3) == 2L)
      val ws = texts(r.getLong(0)).split(" ")
      val na = (ws.length + 1) / 2
      val expect = s"Doc ${r.getLong(0)}\n" + ws.take(na).mkString(" ") + "\n" +
        ws.drop(na).mkString(" ") + s"\nTail (${r.getLong(0)}) \\ AB end\n" +
        PdfOps.FontLine
      assert(r.getString(4) == sha(expect), s"doc ${r.getLong(0)} sha mismatch")
    }
  }
}
