package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Feed parsing: both dialects normalize identically, CDATA vs escaped
  * titles agree, decoys never leak, dates parse with the weekday
  * skipped, malformed items drop alone, hostile inputs never throw.
  */
class FeedOpsSpec extends AnyFunSuite {

  private def feedOf(h: Long, ids: Seq[Long]) = {
    val host = s"h$h.example.test"
    FeedOps.parseFeed(host, FeedOps.buildFeed(host, h, ids))
  }

  test("rss and atom normalize to the same frontier rows") {
    val rss = feedOf(0L, Seq(0L, 4L, 7L)) // CDATA (0,4) and escaped (7)
    val atom = feedOf(1L, Seq(0L, 4L, 7L))
    assert(rss.map(_.fmt).distinct == Seq("rss"))
    assert(atom.map(_.fmt).distinct == Seq("atom"))
    def strip(i: FeedOps.FeedItem) = (i.item_id, i.title, i.pub_day, i.pub_hour)
    assert(rss.map(strip) == atom.map(strip))
    assert(rss.map(_.title) == Seq("Item <0> & raw", "Item <4> & raw", "Item <7> & raw"))
  }

  test("urls decode the escaped ampersand in element text and attributes") {
    for (h <- Seq(2L, 3L); i <- feedOf(h, Seq(11L)))
      assert(i.url == s"https://h$h.example.test/item/11?id=11&ref=feed")
  }

  test("dates: rfc822 weekday skipped, iso parsed, both to epoch day + hour") {
    // doc_id 40: mm=5, dd=13, hh=16
    val d = java.time.LocalDate.of(2026, 5, 13).toEpochDay
    for (h <- Seq(0L, 1L); i <- feedOf(h, Seq(40L))) {
      assert(i.pub_day == d)
      assert(i.pub_hour == 16L)
    }
    assert(FeedOps.rfc822("Sat, 03 Jan 2026 07:05:00 GMT") ==
      (java.time.LocalDate.of(2026, 1, 3).toEpochDay, 7L))
    assert(FeedOps.rfc822("03 Jan 2026 07:05:00 GMT") ==
      (java.time.LocalDate.of(2026, 1, 3).toEpochDay, 7L))
    assert(FeedOps.rfc822("Sat, 99 Jan 2026 07:05:00 GMT")._1 == -1L)
    assert(FeedOps.rfc822("garbage")._1 == -1L)
    assert(FeedOps.iso8601("2026-05-13T16:00:00Z") == (d, 16L))
    assert(FeedOps.iso8601("not-a-date")._1 == -1L)
  }

  test("feed-level decoys never leak into items") {
    assert(feedOf(0L, Nil).isEmpty)
    assert(feedOf(1L, Nil).isEmpty)
    val one = feedOf(1L, Seq(5L))
    assert(one.length == 1)
    assert(!one.head.title.contains("decoy"))
    assert(!one.head.url.endsWith("/")) // not the feed-level link
  }

  test("malformed items drop alone; surrounding items survive") {
    val host = "h0.example.test"
    val good = FeedOps.buildFeed(host, 0L, Seq(1L, 2L))
    // wound item 1's pubDate so only item 2 survives
    val bad = good.replaceFirst("<pubDate>[^<]*</pubDate>",
      "<pubDate>Wed, 99 Zzz 2026</pubDate>")
    assert(FeedOps.parseFeed(host, bad).map(_.item_id) == Seq(2L))
  }

  test("hostile inputs never throw and yield nothing") {
    assert(FeedOps.parseFeed("h", "").isEmpty)
    assert(FeedOps.parseFeed("h", "<html><body>not a feed</body></html>").isEmpty)
    assert(FeedOps.parseFeed("h", "<rss><channel><item><title>t</title>").isEmpty)
    assert(FeedOps.parseFeed("h",
      "<feed><entry><id>urn:item:x</id></entry></feed>").isEmpty)
  }

  test("cdata titles carry raw markup characters verbatim") {
    assert(FeedOps.textOf("<![CDATA[a <b> & c]]>") == "a <b> & c")
    assert(FeedOps.textOf("a &lt;b&gt; &amp; c") == "a <b> & c")
  }
}
