package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Sitemap tree parsing: index dispatch, magic-detected gzip, entity
  * decode, W3C dates, priority default/validation, entry-grain drops,
  * the one-index-level cap, and hostile-input fuzz.
  */
class SitemapOpsSpec extends AnyFunSuite {

  private val utf8 = java.nio.charset.StandardCharsets.UTF_8

  test("round trip: index root, gzip children by parity, all entries attributed") {
    val ids = Seq(0L, 8L, 16L, 24L, 1L, 9L).filter(SitemapOps.hostOf(_) == 0L)
    val rows = SitemapOps.parseSitemapHost(
      "h0.example.test", SitemapOps.buildHostSitemaps(0L, Seq(0L, 8L, 16L, 24L)))
    assert(rows.length == 4)
    assert(rows.forall(_.host == "h0.example.test"))
    // loc decodes the escaped amp
    assert(rows.forall(_.loc.contains("&ref=sm")))
    assert(rows.forall(r => !r.loc.contains("&amp;")))
    // child attribution and gz flags follow the arithmetic
    rows.foreach { r =>
      val id = r.loc.substring(r.loc.indexOf("/doc/") + 5, r.loc.indexOf('&')).toLong
      val k = SitemapOps.childOf(id)
      assert(r.sitemap == SitemapOps.childName(0L, k))
      assert(r.gz == r.sitemap.endsWith(".gz"))
    }
    assert(rows.map(_.gz).toSet == Set(true, false), "both compressions on host 0")
  }

  test("lastmod parses to the real epoch day; omitted priority defaults to 5") {
    val rows = SitemapOps.parseSitemapHost(
      "h5.example.test", SitemapOps.buildHostSitemaps(5L, Seq(5L, 13L)))
    val r5 = rows.find(_.loc.contains("/doc/5&")).get
    assert(r5.lastmod == "2026-06-06")
    assert(r5.lastmod_day == java.time.LocalDate.of(2026, 6, 6).toEpochDay)
    assert(r5.priority_tenths == 5L, "doc 5 omits <priority>: protocol default")
    val r13 = rows.find(_.loc.contains("/doc/13&")).get
    assert(r13.priority_tenths == 3L)
  }

  test("entry-grain drops: bad date or out-of-range priority lose only their entry") {
    val xml = ("<?xml version=\"1.0\"?><urlset>" +
      "<url><loc>https://h/a</loc><lastmod>not-a-date</lastmod></url>" +
      "<url><loc>https://h/b</loc><priority>1.5</priority></url>" +
      "<url><lastmod>2026-01-01</lastmod></url>" + // loc missing
      "<url><loc>https://h/c</loc></url>" +
      "</urlset>").getBytes(utf8)
    val rows = SitemapOps.parseSitemapHost("h", Map("sitemap.xml" -> xml))
    assert(rows.map(_.loc) == Seq("https://h/c"))
    assert(rows.head.lastmod_day == -1L, "absent lastmod sentinels, not drops")
  }

  test("plain urlset root parses directly; nested index child drops; missing child drops") {
    val urlset = ("<urlset><url><loc>https://h/x</loc></url></urlset>").getBytes(utf8)
    assert(SitemapOps.parseSitemapHost("h", Map("sitemap.xml" -> urlset))
      .map(_.loc) == Seq("https://h/x"))
    val index = ("<sitemapindex>" +
      "<sitemap><loc>https://h/child.xml</loc></sitemap>" +
      "<sitemap><loc>https://h/missing.xml</loc></sitemap>" +
      "<sitemap><loc>https://h/nested.xml</loc></sitemap>" +
      "</sitemapindex>").getBytes(utf8)
    val nested = ("<sitemapindex><sitemap><loc>https://h/child.xml</loc>" +
      "</sitemap></sitemapindex>").getBytes(utf8)
    val rows = SitemapOps.parseSitemapHost("h", Map(
      "sitemap.xml" -> index, "child.xml" -> urlset, "nested.xml" -> nested))
    assert(rows.map(_.loc) == Seq("https://h/x"), "one index level only")
  }

  test("gzip detection is by magic, not name; corrupt gzip drops the blob") {
    val urlset = "<urlset><url><loc>https://h/g</loc></url></urlset>".getBytes(utf8)
    val gzNamedXml = Map("sitemap.xml" -> WarcOps.gzipBytes(urlset)) // root gzipped, plain name
    assert(SitemapOps.parseSitemapHost("h", gzNamedXml).map(_.loc) == Seq("https://h/g"))
    val corrupt = WarcOps.gzipBytes(urlset).take(10) ++ Array[Byte](1, 2, 3)
    assert(SitemapOps.parseSitemapHost("h", Map("sitemap.xml" -> corrupt)).isEmpty)
  }

  test("hostile inputs never throw; url cap bounds allocation") {
    val rnd = new scala.util.Random(145)
    for (_ <- 0 until 200) {
      val junk = Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte)
      SitemapOps.parseSitemapHost("h", Map("sitemap.xml" -> junk)) // must not throw
    }
    // unterminated url block, truncated loc
    for (s <- Seq("<urlset><url><loc>x", "<urlset><url>", "<sitemapindex><sitemap>")) {
      assert(SitemapOps.parseSitemapHost("h", Map("sitemap.xml" -> s.getBytes(utf8))).isEmpty)
    }
  }
}
