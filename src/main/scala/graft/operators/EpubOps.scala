package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** EPUB (OCF 3.x) extraction — the e-book text source: an EPUB is a
  * ZIP container (the `ZipOps` walk) holding `META-INF/container.xml`
  * (which names the package document), an OPF package (manifest =
  * id→href catalog; spine = the READING ORDER of manifest ids), and
  * XHTML chapter files. Extraction is spine-driven: the corpus writes
  * the spine REVERSED relative to the manifest so a manifest-order
  * walk produces a different block order and fails the hash.
  *
  * OCF conformance gates the walk: the first entry must be the STORED
  * `mimetype` member with the exact `application/epub+zip` payload —
  * violation is a typed dead letter, as are a missing container/OPF/
  * chapter and any ZIP-layer lie (`ZipOps.entryBytes` CRC contract).
  *
  * Chapter markup goes through the SAME codegen extraction chain as
  * the crawl front door (`HtmlOps.htmlBlocks` — script/style/comment
  * elision, block segmentation, entity decode), so EPUB text lands in
  * the corpus shape every downstream operator (dedup, quality,
  * tokenizers) already consumes. Chapter bodies are XML-escaped by
  * the encoder and entity-decoded by the chain — an exact round trip
  * for arbitrary document text (amp decoded LAST, the q122 rule).
  *
  * Scale shape (100 TB): the container walk is a per-row byte walker
  * via `mapPartitions`; the markup chain is one whole-stage-codegen
  * projection; no shuffle before the output sort.
  */
object EpubOps {

  final case class EpubRaw(
      doc_id: Long, status: String, n_entries: Int, n_chapters: Int, html: String)

  private val utf8 = java.nio.charset.StandardCharsets.UTF_8

  /** First attribute value `name="…"` of a tag string, if present. */
  private def attr(tag: String, name: String): Option[String] = {
    val k = name + "=\""
    val i = tag.indexOf(k)
    if (i < 0) None
    else {
      val e = tag.indexOf('"', i + k.length)
      if (e < 0) None else Some(tag.substring(i + k.length, e))
    }
  }

  /** All `<elem …>` / `<elem …/>` tag strings, in document order. */
  private def tags(xml: String, elem: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val open = "<" + elem
    var i = 0
    while (i < xml.length) {
      val p = xml.indexOf(open, i)
      if (p < 0) i = xml.length
      else {
        val after = if (p + open.length < xml.length) xml.charAt(p + open.length) else ' '
        if (after != ' ' && after != '\t' && after != '>' && after != '/') i = p + open.length
        else {
          val gt = xml.indexOf('>', p)
          if (gt < 0) i = xml.length
          else { out += xml.substring(p, gt + 1); i = gt + 1 }
        }
      }
    }
    out.toSeq
  }

  // ---------------------------------------------------------------- parse

  /** Full OCF walk; the error-as-value contract. */
  private[graft] def extractEpub(docId: Long, b: Array[Byte]): EpubRaw = {
    def dead(status: String) = EpubRaw(docId, status, 0, 0, "")
    ZipOps.centralDirectory(b) match {
      case None => dead("not-zip")
      case Some(entries) =>
        // OCF rule: entry 0 is the STORED `mimetype` with the exact label
        val mimeOk = entries.headOption.exists(e =>
          e.name == "mimetype" && e.method == 0 &&
            ZipOps.entryBytes(b, e).exists(raw =>
              new String(raw, utf8) == "application/epub+zip"))
        if (!mimeOk) return dead("bad-mimetype")
        val container = entries.find(_.name == "META-INF/container.xml")
          .flatMap(ZipOps.entryBytes(b, _)).map(new String(_, utf8))
        val opfPath = container.flatMap(c =>
          tags(c, "rootfile").headOption.flatMap(attr(_, "full-path")))
        opfPath match {
          case None => dead("no-container")
          case Some(path) =>
            val opfDir = path.lastIndexOf('/') match {
              case -1 => ""
              case i => path.substring(0, i + 1)
            }
            entries.find(_.name == path).flatMap(ZipOps.entryBytes(b, _))
              .map(new String(_, utf8)) match {
              case None => dead("no-opf")
              case Some(opf) =>
                val hrefs = tags(opf, "item").flatMap(t =>
                  for (id <- attr(t, "id"); h <- attr(t, "href")) yield id -> h).toMap
                val spine = tags(opf, "itemref").flatMap(attr(_, "idref"))
                if (spine.isEmpty) return dead("no-opf")
                val chapters = spine.map(id => hrefs.get(id).flatMap(h =>
                  entries.find(_.name == opfDir + h).flatMap(ZipOps.entryBytes(b, _))))
                if (chapters.exists(_.isEmpty)) dead("no-chapter")
                else EpubRaw(docId, "ok", entries.length, chapters.length,
                  chapters.flatten.map(new String(_, utf8)).mkString)
            }
        }
    }
  }

  // --------------------------------------------------------------- encode

  private[graft] def chapterCount(id: Long): Int = (2 + id % 3).toInt

  /** Chapter `c`'s XHTML: a title, a heading, and the document words
    * whose index ≡ c (mod chapterCount) — pure (doc_id, text) word
    * arithmetic, body XML-escaped for the exact chain round trip.
    */
  private[graft] def chapterXhtml(id: Long, c: Int, words: Seq[String]): String =
    "<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
      "<html xmlns=\"http://www.w3.org/1999/xhtml\"><head><title>T" + c +
      " doc " + id + "</title></head><body><h1>Ch " + c + " of " + id +
      "</h1><p>" + ZipOps.xmlEscape(words.mkString(" ")) + "</p></body></html>"

  /** A real OCF container: stored `mimetype` FIRST, container.xml, an
    * OPF whose spine REVERSES the manifest order, and one XHTML file
    * per chapter (compression alternating by (doc_id + chapter)).
    */
  private[graft] def buildEpub(id: Long, text: String): Array[Byte] = {
    val nch = chapterCount(id)
    val words = text.split("[ \t\r\n]+").filter(_.nonEmpty).toSeq
    val manifest = (0 until nch).map(c =>
      s"""<item id="c$c" href="ch$c.xhtml" media-type="application/xhtml+xml"/>""").mkString
    val spine = (nch - 1 to 0 by -1).map(c => s"""<itemref idref="c$c"/>""").mkString
    val opf =
      "<?xml version=\"1.0\"?><package xmlns=\"http://www.idpf.org/2007/opf\" version=\"3.0\">" +
        "<manifest>" + manifest + "</manifest><spine>" + spine + "</spine></package>"
    val container =
      "<?xml version=\"1.0\"?><container version=\"1.0\" " +
        "xmlns=\"urn:oasis:names:tc:opendocument:xmlns:container\"><rootfiles>" +
        "<rootfile full-path=\"OEBPS/content.opf\" media-type=\"application/oebps-package+xml\"/>" +
        "</rootfiles></container>"
    val chapterEntries = (0 until nch).map { c =>
      val ws = words.zipWithIndex.collect { case (w, i) if i % nch == c => w }
      (s"OEBPS/ch$c.xhtml", chapterXhtml(id, c, ws).getBytes(utf8), (id + c) % 2 == 0)
    }
    ZipOps.buildZip(
      ("mimetype", "application/epub+zip".getBytes(utf8), false) +:
        ("META-INF/container.xml", container.getBytes(utf8), true) +:
        ("OEBPS/content.opf", opf.getBytes(utf8), true) +:
        chapterEntries)
  }

  // ----------------------------------------------------------------- q144

  /** q144: the e-book front door end-to-end — build a real EPUB per
    * document, enforce the OCF mimetype rule, resolve container →
    * OPF → spine, read chapters in SPINE order (reversed vs the
    * manifest on this corpus), and push the assembled markup through
    * the q122 extraction chain; entry/chapter/block counts and the
    * block-text sha all replayed by the oracle from pure
    * (doc_id, text) word arithmetic.
    */
  def q144EpubExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val blocks = HtmlOps.htmlBlocks(col("html"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) => extractEpub(id, buildEpub(id, t)) })
      .toDF()
      .select(col("doc_id"), col("status"),
        col("n_entries").cast("long").as("n_entries"),
        col("n_chapters").cast("long").as("n_chapters"),
        size(blocks).cast("long").as("n_blocks"),
        sha2(array_join(blocks, "\n"), 256).as("text_sha"))
      .orderBy(col("doc_id"))
  }
}
