package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sitemap parsing (sitemaps.org protocol) — the crawl frontier's
  * DISCOVERY side, the complement of q141's robots politeness gate: a
  * host advertises its URLs in `<urlset>` documents, optionally
  * sharded behind a `<sitemapindex>`, optionally gzip-compressed
  * (`.xml.gz` — the protocol's blessing for large maps). Parsing
  * yields the frontier rows a crawler feeds into fetch scheduling:
  * location, last-modified day, and priority.
  *
  * Semantics implemented from the protocol:
  *   - root dispatch: `<sitemapindex>` → resolve each child `<loc>`
  *     and parse it as a urlset; a plain `<urlset>` root parses
  *     directly; nesting beyond ONE index level is dropped (the
  *     common crawler cap — pinned by spec);
  *   - gzip children: detected by MAGIC (1f 8b), not name — a
  *     mislabeled child still parses; inflate via the WarcOps member
  *     machinery;
  *   - per-url elements: `<loc>` required (XML entities decoded —
  *     `&amp;` in query strings is the protocol's own example),
  *     `<lastmod>` W3C date parsed to an epoch day, `<priority>`
  *     optional with the protocol's 0.5 DEFAULT when absent;
  *   - the 50 000-URLs-per-sitemap protocol cap, enforced as an
  *     allocation bound.
  *
  * Scale shape (100 TB): sitemaps are a per-HOST dimension (tiny next
  * to the frontier); parsing is per-blob work inside `mapPartitions`
  * — the host fan-out is the only shuffle, and it is corpus
  * construction, not the operator.
  *
  * The q145 corpus builds a real sitemap tree per host (index root,
  * 2–3 children, alternating gzip) whose entries are pure doc_id
  * arithmetic, so the oracle replays every output column — loc
  * (escaped-amp decode included), epoch day, priority default, child
  * attribution, gz flag — without seeing any XML.
  */
object SitemapOps {

  private val MaxUrlsPerSitemap = 50000

  final case class SitemapUrl(
      host: String, loc: String, lastmod: String, lastmod_day: Long,
      priority_tenths: Long, sitemap: String, gz: Boolean)

  // ---------------------------------------------------------------- parse

  /** Text of the first `<elem>…</elem>` inside `s`, if present. */
  private def elemText(s: String, elem: String): Option[String] = {
    val open = "<" + elem + ">"
    val i = s.indexOf(open)
    if (i < 0) None
    else {
      val e = s.indexOf("</" + elem + ">", i + open.length)
      if (e < 0) None else Some(s.substring(i + open.length, e))
    }
  }

  /** All `<elem>…</elem>` blocks of `s`, in order. */
  private def blocks(s: String, elem: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val open = "<" + elem + ">"
    val close = "</" + elem + ">"
    var i = 0
    while (i < s.length && out.length < MaxUrlsPerSitemap) {
      val p = s.indexOf(open, i)
      if (p < 0) i = s.length
      else {
        val e = s.indexOf(close, p + open.length)
        if (e < 0) i = s.length
        else { out += s.substring(p + open.length, e); i = e + close.length }
      }
    }
    out.toSeq
  }

  private def gunzipIfNeeded(b: Array[Byte]): Option[(Array[Byte], Boolean)] =
    if (b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b)
      try {
        val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(b))
        Some((in.readAllBytes(), true))
      } catch { case _: java.io.IOException => None }
    else Some((b, false))

  /** One urlset body → rows; malformed `<url>` blocks (no loc, bad
    * date) drop individually — error-as-value at the entry grain.
    */
  private def parseUrlset(
      host: String, xml: String, sitemap: String, gz: Boolean): Seq[SitemapUrl] =
    blocks(xml, "url").flatMap { u =>
      for {
        loc <- elemText(u, "loc").map(ZipOps.xmlUnescape)
        lastmod = elemText(u, "lastmod").getOrElse("")
        day <-
          if (lastmod.isEmpty) Some(-1L)
          else
            try Some(java.time.LocalDate.parse(lastmod).toEpochDay)
            catch { case _: java.time.format.DateTimeParseException => None }
        // protocol default priority is 0.5 when the element is absent
        prio <- elemText(u, "priority") match {
          case None => Some(5L)
          case Some(p) =>
            try {
              val v = java.lang.Double.parseDouble(p)
              if (v < 0.0 || v > 1.0) None else Some(math.round(v * 10))
            } catch { case _: NumberFormatException => None }
        }
      } yield SitemapUrl(host, loc, lastmod, day, prio, sitemap, gz)
    }

  /** Parse a host's sitemap tree: the root blob dispatches on its
    * document element; index children resolve by the LAST path
    * segment of their `<loc>` into `blobs`; a missing or doubly-
    * nested child drops (entry-grain error-as-value).
    */
  private[graft] def parseSitemapHost(
      host: String, blobs: Map[String, Array[Byte]],
      root: String = "sitemap.xml"): Seq[SitemapUrl] =
    blobs.get(root).toSeq.flatMap { rootRaw =>
      gunzipIfNeeded(rootRaw).toSeq.flatMap { case (rb, rootGz) =>
        val xml = new String(rb, java.nio.charset.StandardCharsets.UTF_8)
        if (xml.contains("<sitemapindex")) {
          blocks(xml, "sitemap").flatMap { sm =>
            elemText(sm, "loc").map(ZipOps.xmlUnescape).toSeq.flatMap { childLoc =>
              val name = childLoc.substring(childLoc.lastIndexOf('/') + 1)
              blobs.get(name).toSeq.flatMap { raw =>
                gunzipIfNeeded(raw).toSeq.flatMap { case (cb, gz) =>
                  val cxml = new String(cb, java.nio.charset.StandardCharsets.UTF_8)
                  // one index level only: a nested index child drops
                  if (cxml.contains("<sitemapindex")) Nil
                  else parseUrlset(host, cxml, name, gz)
                }
              }
            }
          }
        } else parseUrlset(host, xml, root, rootGz)
      }
    }

  // --------------------------------------------------------------- encode

  private[graft] def hostOf(id: Long): Long = id % 8
  private[graft] def childCount(h: Long): Int = (2 + h % 2).toInt
  private[graft] def childOf(id: Long): Int =
    ((id / 8) % childCount(hostOf(id))).toInt
  private[graft] def childName(h: Long, k: Int): String =
    s"sitemap_$k" + (if ((h + k) % 2 == 0) ".xml.gz" else ".xml")

  /** One document's `<url>` entry — the pure doc_id arithmetic the
    * oracle replays: an escaped `&amp;` in the loc, a W3C lastmod, and
    * priority OMITTED for `doc_id % 5 == 0` (the protocol-default
    * branch).
    */
  private[graft] def urlEntry(id: Long): String = {
    val h = hostOf(id)
    val mm = 1 + id % 12
    val dd = 1 + id % 28
    val prio =
      if (id % 5 == 0) ""
      else s"<priority>0.${id % 10}</priority>"
    f"<url><loc>https://h$h.example.test/doc/$id&amp;ref=sm</loc>" +
      f"<lastmod>2026-$mm%02d-$dd%02d</lastmod>$prio</url>"
  }

  /** A host's real sitemap tree: an index root naming 2–3 children,
    * children alternating gzip by (host + child) parity.
    */
  private[graft] def buildHostSitemaps(
      h: Long, docIds: Seq[Long]): Map[String, Array[Byte]] = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val nch = childCount(h)
    val children = (0 until nch).map { k =>
      val body = docIds.filter(childOf(_) == k).sorted.map(urlEntry).mkString
      val xml = "<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
        "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">" +
        body + "</urlset>"
      val name = childName(h, k)
      val raw = xml.getBytes(utf8)
      name -> (if (name.endsWith(".gz")) WarcOps.gzipBytes(raw) else raw)
    }
    val index = "<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
      "<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">" +
      children.map { case (name, _) =>
        s"<sitemap><loc>https://h$h.example.test/$name</loc></sitemap>"
      }.mkString + "</sitemapindex>"
    (children :+ ("sitemap.xml" -> index.getBytes(utf8))).toMap
  }

  // ----------------------------------------------------------------- q145

  /** q145: frontier discovery end-to-end — build each host's real
    * sitemap tree (index root, gzip-alternating children), parse it
    * back (magic-detected gzip, entity-decoded locs, W3C dates,
    * default priority), and emit the frontier rows; every column
    * replayed by the oracle from pure doc_id arithmetic.
    */
  def q145SitemapParse(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .groupBy((col("doc_id") % 8).as("h"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .as[(Long, Seq[Long])]
      .flatMap { case (h, ids) =>
        parseSitemapHost(s"h$h.example.test", buildHostSitemaps(h, ids))
      }
      .toDF()
      .select(col("host"), col("loc"), col("lastmod"),
        col("lastmod_day"), col("priority_tenths"), col("sitemap"), col("gz"))
      .orderBy(col("host"), col("loc"))
  }
}
