package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** ZIP walk + DOCX extraction: round trip over both methods, CRC/
  * structural dead letters, decoy/delText fidelity, EOCD comment
  * tolerance, entity decode, and truncation fuzz (never throws).
  */
class ZipOpsSpec extends AnyFunSuite {

  private val utf8 = java.nio.charset.StandardCharsets.UTF_8

  test("round trip: stored and deflated document.xml extract identically") {
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma"
    for (id <- Seq(6L, 7L)) { // even=deflate, odd=stored
      val out = ZipOps.extractDocx(id, ZipOps.buildDocx(id, text))
      assert(out.status == "ok")
      assert(out.n_entries == 3)
      assert(out.method == (if (id % 2 == 0) "deflate" else "stored"))
      val expect = (ZipOps.paragraphsOf(text) :+ ZipOps.markerParagraph(id))
      assert(out.n_paragraphs == expect.length)
      assert(out.text == expect.mkString("\n"))
      assert(!out.text.contains("DECOY"), "styles.xml text must not leak")
      assert(!out.text.contains("REMOVED"), "w:delText must be skipped")
    }
  }

  test("marker paragraph survives: entities, tab, break, doc id") {
    val out = ZipOps.extractDocx(11L, ZipOps.buildDocx(11L, "one two"))
    assert(out.status == "ok")
    assert(out.text.endsWith("Amp & lt < gt > quot \" apos ' tab\tbreak\nfin 11"))
  }

  test("xml entity decode: named, numeric, invalid stay literal") {
    assert(ZipOps.xmlUnescape("&amp;&lt;&gt;&quot;&apos;") == "&<>\"'")
    assert(ZipOps.xmlUnescape("a&#65;b&#x42;c") == "aAbBc")
    assert(ZipOps.xmlUnescape("&#128512;") == new String(Character.toChars(0x1f600)))
    assert(ZipOps.xmlUnescape("&bogus;&#xD800;&#0;&#1114112;&") ==
      "&bogus;&#xD800;&#0;&#1114112;&")
    val s = "x & y < z > \"w\" 'v'"
    assert(ZipOps.xmlUnescape(ZipOps.xmlEscape(s)) == s)
  }

  test("EOCD backward scan tolerates a trailing archive comment") {
    val zip = ZipOps.buildDocx(3L, "hello world")
    // junk tail (as an unaccounted comment would sit): scan still lands
    val out = ZipOps.extractDocx(3L, zip ++ "trailing-comment".getBytes(utf8))
    assert(out.status == "ok")
    assert(out.text == ZipOps.extractDocx(3L, zip).text)
  }

  test("dead letters: not-zip, no-document, corrupt deflate / CRC lie") {
    assert(ZipOps.extractDocx(1L, Array.empty[Byte]).status == "not-zip")
    assert(ZipOps.extractDocx(1L, "random bytes".getBytes(utf8)).status == "not-zip")
    val noDoc = ZipOps.buildZip(Seq(("other.xml", "<a/>".getBytes(utf8), true)))
    assert(ZipOps.extractDocx(1L, noDoc).status == "no-document")
    // flip a byte inside the deflated document.xml stream: CRC must catch
    val zip = ZipOps.buildDocx(2L, "some words here") // even id: deflated
    val s = new String(zip, java.nio.charset.StandardCharsets.ISO_8859_1)
    val dataOff = s.indexOf("word/document.xml") + "word/document.xml".length
    val bad = zip.clone()
    bad(dataOff + 20) = (bad(dataOff + 20) ^ 0x5a).toByte
    assert(ZipOps.extractDocx(2L, bad).status == "bad-entry")
    // stored entry with a lying CRC in the central directory
    val zipOdd = ZipOps.buildDocx(3L, "stored words") // odd id: stored
    val cd = new String(zipOdd, java.nio.charset.StandardCharsets.ISO_8859_1)
      .lastIndexOf("word/document.xml") - 46
    val lied = zipOdd.clone()
    lied(cd + 16) = (lied(cd + 16) ^ 0x77).toByte
    assert(ZipOps.extractDocx(3L, lied).status == "bad-entry")
  }

  test("truncation fuzz: every cut yields a typed status, never a throw") {
    val zip = ZipOps.buildDocx(5L, "alpha beta gamma delta")
    val statuses = Set("ok", "not-zip", "no-document", "bad-entry")
    for (cut <- 0 to zip.length by 7) {
      val st = ZipOps.extractDocx(5L, zip.take(cut)).status
      assert(statuses.contains(st), s"cut=$cut gave $st")
      // only the full archive may claim ok: the EOCD sits at the end
      if (cut < zip.length) assert(st != "ok", s"cut=$cut claimed ok")
    }
    // random byte flips: typed status or identical text, never a throw
    val rnd = new scala.util.Random(143)
    for (_ <- 0 until 200) {
      val m = zip.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      val st = ZipOps.extractDocx(5L, m).status
      assert(statuses.contains(st))
    }
  }

  test("empty text still carries the marker paragraph alone") {
    val out = ZipOps.extractDocx(9L, ZipOps.buildDocx(9L, ""))
    assert(out.status == "ok")
    assert(out.n_paragraphs == 1)
    assert(out.text == ZipOps.markerParagraph(9L))
  }
}
