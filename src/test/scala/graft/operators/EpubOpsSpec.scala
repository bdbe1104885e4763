package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** EPUB / OCF walk: spine-driven chapter order, the mimetype rule,
  * dead letters, and truncation/byte-flip fuzz (never throws).
  */
class EpubOpsSpec extends AnyFunSuite {

  private val utf8 = java.nio.charset.StandardCharsets.UTF_8

  test("round trip: chapters assemble in SPINE order (reversed), escaped body intact") {
    val text = "w0 w1 w2 w3 w4 w5 w6 w7 w8"
    val id = 3L // nch = 2 + 3%3 = 2
    val out = EpubOps.extractEpub(id, EpubOps.buildEpub(id, text))
    assert(out.status == "ok")
    assert(out.n_chapters == EpubOps.chapterCount(id))
    assert(out.n_entries == 3 + EpubOps.chapterCount(id))
    // spine reverses the manifest: chapter 1 before chapter 0
    val i0 = out.html.indexOf("Ch 0 of " + id)
    val i1 = out.html.indexOf("Ch 1 of " + id)
    assert(i1 >= 0 && i0 > i1, "spine order must drive assembly")
    assert(out.html.contains("w1 w3 w5 w7"), "chapter 1 = odd-index words")
    assert(out.html.contains("w0 w2 w4 w6 w8"), "chapter 0 = even-index words")
  }

  test("special characters round-trip through escape + the q122 chain shape") {
    val id = 4L
    val out = EpubOps.extractEpub(id, EpubOps.buildEpub(id, "a&b x<y p>q \"r\" 's'"))
    assert(out.status == "ok")
    for (w <- Seq("a&amp;b", "x&lt;y", "p&gt;q", "&quot;r&quot;", "&apos;s&apos;"))
      assert(out.html.contains(w), s"body must carry XML-escaped $w")
  }

  test("OCF mimetype rule: wrong content, deflated member, or wrong first entry dead-letters") {
    val text = "alpha beta"
    // wrong payload
    val wrong = ZipOps.buildZip(Seq(
      ("mimetype", "text/plain".getBytes(utf8), false),
      ("META-INF/container.xml", "<x/>".getBytes(utf8), true)))
    assert(EpubOps.extractEpub(1L, wrong).status == "bad-mimetype")
    // deflated mimetype (OCF demands stored)
    val deflated = ZipOps.buildZip(Seq(
      ("mimetype", "application/epub+zip".getBytes(utf8), true)))
    assert(EpubOps.extractEpub(1L, deflated).status == "bad-mimetype")
    // mimetype not first
    val notFirst = ZipOps.buildZip(Seq(
      ("other", "x".getBytes(utf8), false),
      ("mimetype", "application/epub+zip".getBytes(utf8), false)))
    assert(EpubOps.extractEpub(1L, notFirst).status == "bad-mimetype")
    // the real container is fine
    assert(EpubOps.extractEpub(5L, EpubOps.buildEpub(5L, text)).status == "ok")
  }

  test("dead letters: missing container / opf / chapter") {
    def zip(names: Seq[(String, String, Boolean)]) =
      ZipOps.buildZip(("mimetype", "application/epub+zip".getBytes(utf8), false) +:
        names.map { case (n, c, d) => (n, c.getBytes(utf8), d) })
    assert(EpubOps.extractEpub(1L, zip(Nil)).status == "no-container")
    val cx = "<container><rootfiles><rootfile full-path=\"OEBPS/content.opf\"/></rootfiles></container>"
    assert(EpubOps.extractEpub(1L, zip(Seq(
      ("META-INF/container.xml", cx, true)))).status == "no-opf")
    val opf = "<package><manifest><item id=\"c0\" href=\"ch0.xhtml\"/></manifest>" +
      "<spine><itemref idref=\"c0\"/></spine></package>"
    assert(EpubOps.extractEpub(1L, zip(Seq(
      ("META-INF/container.xml", cx, true),
      ("OEBPS/content.opf", opf, true)))).status == "no-chapter")
    // idref pointing at a missing manifest id
    val opfBadRef = "<package><manifest><item id=\"c0\" href=\"ch0.xhtml\"/></manifest>" +
      "<spine><itemref idref=\"nope\"/></spine></package>"
    assert(EpubOps.extractEpub(1L, zip(Seq(
      ("META-INF/container.xml", cx, true),
      ("OEBPS/content.opf", opfBadRef, true),
      ("OEBPS/ch0.xhtml", "<html/>", true)))).status == "no-chapter")
  }

  test("truncation and byte-flip fuzz: typed status, never a throw") {
    val epub = EpubOps.buildEpub(7L, "one two three four five six seven")
    val statuses = Set("ok", "not-zip", "bad-mimetype", "no-container", "no-opf", "no-chapter")
    for (cut <- 0 to epub.length by 7) {
      val st = EpubOps.extractEpub(7L, epub.take(cut)).status
      assert(statuses.contains(st), s"cut=$cut gave $st")
    }
    val rnd = new scala.util.Random(144)
    for (_ <- 0 until 200) {
      val m = epub.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      assert(statuses.contains(EpubOps.extractEpub(7L, m).status))
    }
  }
}
