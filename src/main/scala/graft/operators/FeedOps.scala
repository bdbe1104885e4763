package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** RSS 2.0 / Atom feed parsing — the crawl frontier's freshness side,
  * completing the discovery trio: sitemaps (q145) enumerate, robots
  * (q141) gate, feeds announce what changed. A crawler that re-visits
  * by feed instead of re-fetching everything is the difference between
  * a daily and a monthly refresh at 100 TB.
  *
  * One feed per host — even hosts publish RSS 2.0 (`<item>`,
  * `<pubDate>` in RFC 822 form with its redundant weekday, `<guid>`),
  * odd hosts Atom (`<entry>`, `<updated>` in ISO 8601, `<link href>`
  * as an ATTRIBUTE, `<id>`) — so the parser proves both dialects
  * normalize to one frontier schema. Realities pinned by the corpus:
  * channel/feed-level `<title>`/`<link>`/`<id>` decoys that must not
  * leak into items; titles delivered BOTH ways (CDATA for
  * `doc_id % 4 == 0`, entity-escaped otherwise) that must decode to
  * the same text; `&` in URLs arriving escaped (`&amp;`) in element
  * text and attributes alike; the RFC 822 weekday skipped, never
  * trusted.
  *
  * Parse discipline: per-row scan over item/entry spans only
  * (feed-level elements are structurally outside), entity decode via
  * the shared `ZipOps.xmlUnescape`, error-as-value — a malformed item
  * drops alone, the feed continues.
  *
  * The oracle replays every frontier column — host, format, decoded
  * url/title, epoch-day and hour from the month/day/hour arithmetic —
  * without seeing a feed byte: any span slip, CDATA/entity divergence,
  * date mis-parse, or decoy leak changes rows.
  *
  * Scale shape (100 TB): one output-sized shuffle groups items into
  * host feeds (the q146 CDX shape); parse is per-row via
  * `mapPartitions`, frontier-linear.
  */
object FeedOps {

  final case class FeedItem(
      item_id: Long, host: String, fmt: String, url: String, title: String,
      pub_day: Long, pub_hour: Long)

  private val Months = Array("Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")

  // --------------------------------------------------------------- encode

  private def itemUrl(host: String, id: Long): String =
    s"https://$host/item/$id?id=$id&ref=feed"

  private def titleOf(id: Long): String = s"Item <$id> & raw"

  /** (mm, dd, hh) from the id arithmetic; dd ≤ 28 keeps every month valid. */
  private def dateOf(id: Long): (Int, Int, Int) =
    ((1 + id % 12).toInt, (1 + id % 28).toInt, (id % 24).toInt)

  private def titleXml(id: Long): String =
    if (id % 4 == 0) "<![CDATA[" + titleOf(id) + "]]>"
    else ZipOps.xmlEscape(titleOf(id))

  private def rssItem(host: String, id: Long): String = {
    val (mm, dd, hh) = dateOf(id)
    val wd = java.time.LocalDate.of(2026, mm, dd).getDayOfWeek.getDisplayName(
      java.time.format.TextStyle.SHORT, java.util.Locale.US)
    s"<item><title>${titleXml(id)}</title>" +
      s"<link>${ZipOps.xmlEscape(itemUrl(host, id))}</link>" +
      f"<pubDate>$wd, $dd%02d ${Months(mm - 1)} 2026 $hh%02d:00:00 GMT</pubDate>" +
      s"""<guid isPermaLink="false">urn:item:$id</guid></item>"""
  }

  private def atomEntry(host: String, id: Long): String = {
    val (mm, dd, hh) = dateOf(id)
    s"<entry><title>${titleXml(id)}</title>" +
      s"""<link href="${ZipOps.xmlEscape(itemUrl(host, id))}" rel="alternate"/>""" +
      f"<updated>2026-$mm%02d-$dd%02dT$hh%02d:00:00Z</updated>" +
      s"<id>urn:item:$id</id></entry>"
  }

  /** One host's feed: RSS for even hosts, Atom for odd, with
    * feed-level title/link/id decoys the item scan must not touch.
    */
  private[graft] def buildFeed(host: String, h: Long, ids: Seq[Long]): String =
    if (h % 2 == 0)
      "<?xml version=\"1.0\" encoding=\"UTF-8\"?><rss version=\"2.0\"><channel>" +
        s"<title>Channel decoy &amp; $host</title><link>https://$host/</link>" +
        s"<description>feed of $host</description>" +
        ids.map(rssItem(host, _)).mkString + "</channel></rss>"
    else
      "<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
        "<feed xmlns=\"http://www.w3.org/2005/Atom\">" +
        s"<title>Feed decoy &amp; $host</title><id>urn:feed:$h</id>" +
        s"""<link href="https://$host/"/><updated>2026-01-01T00:00:00Z</updated>""" +
        ids.map(atomEntry(host, _)).mkString + "</feed>"

  // ----------------------------------------------------------------- walk

  private def between(s: String, from: Int, open: String, close: String): Option[(String, Int)] = {
    val a = s.indexOf(open, from)
    if (a < 0) return None
    val b = s.indexOf(close, a + open.length)
    if (b < 0) None else Some((s.substring(a + open.length, b), b + close.length))
  }

  /** Element text → decoded: CDATA stripped verbatim, else entities. */
  private[graft] def textOf(raw: String): String = {
    val t = raw.trim
    if (t.startsWith("<![CDATA[") && t.endsWith("]]>"))
      t.substring(9, t.length - 3)
    else ZipOps.xmlUnescape(t)
  }

  /** RFC 822 date: optional weekday before the comma skipped, month by
    * name; -1 sentinel on garbage (the item then drops).
    */
  private[graft] def rfc822(s: String): (Long, Long) = {
    val body = s.substring(s.indexOf(',') + 1).trim // weekday never trusted
    val parts = body.split("\\s+")
    if (parts.length < 5) return (-1L, -1L)
    val mm = Months.indexOf(parts(1)) + 1
    try {
      val dd = parts(0).toInt
      val yyyy = parts(2).toInt
      val hh = parts(3).split(":")(0).toInt
      if (mm < 1) (-1L, -1L)
      else (java.time.LocalDate.of(yyyy, mm, dd).toEpochDay, hh.toLong)
    } catch { case _: RuntimeException => (-1L, -1L) }
  }

  /** ISO 8601 instant (date + hour suffice for the frontier). */
  private[graft] def iso8601(s: String): (Long, Long) =
    try {
      val d = java.time.LocalDate.of(
        s.substring(0, 4).toInt, s.substring(5, 7).toInt, s.substring(8, 10).toInt)
      (d.toEpochDay, s.substring(11, 13).toLong)
    } catch { case _: RuntimeException => (-1L, -1L) }

  /** Parse one host feed to frontier rows; a malformed item drops alone. */
  private[graft] def parseFeed(host: String, xml: String): Seq[FeedItem] = {
    val isRss = xml.contains("<rss")
    val (fmt, open, close) =
      if (isRss) ("rss", "<item>", "</item>")
      else if (xml.contains("<feed")) ("atom", "<entry>", "</entry>")
      else return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[FeedItem]
    var p = 0
    var go = true
    while (go) {
      between(xml, p, open, close) match {
        case None => go = false
        case Some((item, next)) =>
          p = next
          val title = between(item, 0, "<title>", "</title>").map(t => textOf(t._1))
          val url =
            if (isRss) between(item, 0, "<link>", "</link>")
              .map(t => ZipOps.xmlUnescape(t._1.trim))
            else "<link\\s[^>]*href=\"([^\"]*)\"".r.findFirstMatchIn(item)
              .map(m => ZipOps.xmlUnescape(m.group(1)))
          val id =
            (if (isRss) between(item, 0, ">urn:item:", "</guid>")
             else between(item, 0, "<id>urn:item:", "</id>"))
              .flatMap(t => t._1.toLongOption)
          val (day, hour) =
            (if (isRss) between(item, 0, "<pubDate>", "</pubDate>").map(t => rfc822(t._1))
             else between(item, 0, "<updated>", "</updated>").map(t => iso8601(t._1)))
              .getOrElse((-1L, -1L))
          (title, url, id) match {
            case (Some(t), Some(u), Some(i)) if day >= 0 =>
              out += FeedItem(i, host, fmt, u, t, day, hour)
            case _ => () // malformed item: drops alone
          }
      }
    }
    out.toSeq
  }

  // ----------------------------------------------------------------- q149

  /** q149: feeds end to end — build each host's real RSS/Atom feed,
    * parse both dialects back to one frontier schema; every column
    * replayed by the oracle from doc_id arithmetic.
    */
  def q149FeedParse(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select((col("doc_id") % 8).as("h"), col("doc_id"))
      .groupBy(col("h"))
      .agg(array_sort(collect_list(col("doc_id"))).as("ids"))
      .as[(Long, Seq[Long])]
      .mapPartitions(_.flatMap { case (h, ids) =>
        parseFeed(s"h$h.example.test", buildFeed(s"h$h.example.test", h, ids))
      })
      .toDF()
      .select(col("item_id"), col("host"), col("fmt"), col("url"), col("title"),
        col("pub_day"), col("pub_hour"))
      .orderBy(col("item_id"))
  }
}
