package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ZIP container walk (PKWARE APPNOTE.TXT) + DOCX text extraction
  * (ECMA-376 WordprocessingML) — the office-document text source a
  * real crawl carries beside HTML (q122) and PDF (q136): DOCX, XLSX,
  * EPUB, and ODT are all ZIP containers, so the central-directory
  * walk is the shared front door and WordprocessingML is its first
  * consumer.
  *
  * The walk is END-anchored, the way the format demands: scan
  * backward for the End-of-Central-Directory record (the trailing
  * comment makes a fixed offset impossible), read the central
  * directory it points at (the AUTHORITATIVE entry list — local
  * headers may carry zeroed sizes under streaming writers), then per
  * entry jump to the local header, skip ITS name/extra lengths (they
  * may differ from the central copy), and take `csize` bytes: stored
  * (method 0) verbatim, deflated (method 8) through the JDK
  * `Inflater` (the PNG/WebP/PDF precedent — raw deflate, nowrap).
  * Every inflated entry is verified against the central directory's
  * CRC-32 and uncompressed size; a lie is a typed dead letter, never
  * a throw.
  *
  * DOCX text: `word/document.xml` only (`word/styles.xml` etc. carry
  * no body text — the corpus plants a decoy there to prove entry
  * selection by name). Paragraph elements `<w:p>` become lines; in
  * each, text runs `<w:t>` concatenate (XML entities decoded),
  * `<w:tab/>` is a tab, `<w:br/>` a line break, and `<w:delText>`
  * (tracked-change deletions) is skipped — the fidelity rules a
  * training-data pipeline needs so revision cruft never leaks into
  * the corpus.
  *
  * Codec discipline (`Jpeg`/`Webp`/`Mp4Ops`/`PdfOps`): offset-driven,
  * error-as-value, allocation bounded BEFORE trusting header sizes
  * (entry count, name length, uncompressed size), truncation-fuzzed.
  *
  * The q143 corpus builds a real three-entry DOCX per document whose
  * body paragraphs are pure (doc_id, text) word arithmetic, so the
  * oracle replays paragraph counts, character counts, and the
  * extracted-text sha without ever seeing a ZIP byte — the
  * encode→decode collapse: any EOCD mis-scan, central/local header
  * slip, inflate fault, entity mis-decode, or leaked decoy/delText
  * changes the hash.
  *
  * Scale shape (100 TB): per-row byte walker via `mapPartitions`, no
  * shuffle before the output sort; work linear in archive size.
  */
object ZipOps {

  private val MaxEntries = 4096
  private val MaxNameLen = 4096
  private val MaxUncompressed = 1L << 26

  final case class ZipEntry(
      name: String, method: Int, crc: Long, csize: Int, usize: Int, off: Int)

  final case class DocxInfo(
      doc_id: Long, status: String, n_entries: Int, method: String,
      n_paragraphs: Int, text: String)

  // ----------------------------------------------------------------- walk

  private def le16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

  /** Backward scan for the EOCD signature `PK\x05\x06` — the record
    * sits `comment_length` bytes before EOF, so only a scan finds it.
    */
  private def findEocd(b: Array[Byte]): Option[Int] = {
    val lo = math.max(0, b.length - 22 - 65535)
    var p = b.length - 22
    while (p >= lo) {
      if (b(p) == 0x50 && b(p + 1) == 0x4b && b(p + 2) == 5 && b(p + 3) == 6)
        return Some(p)
      p -= 1
    }
    None
  }

  /** The central directory — the archive's authoritative entry list. */
  private[graft] def centralDirectory(b: Array[Byte]): Option[Seq[ZipEntry]] =
    findEocd(b).flatMap { e =>
      val n = le16(b, e + 10)
      val cdOff = le32(b, e + 16)
      if (n > MaxEntries || cdOff < 0 || cdOff > b.length) None
      else {
        val out = scala.collection.mutable.ArrayBuffer.empty[ZipEntry]
        var p = cdOff.toInt
        var i = 0
        var ok = true
        while (ok && i < n) {
          if (p + 46 > b.length || le32(b, p) != 0x02014b50L) ok = false
          else {
            val nameLen = le16(b, p + 28)
            val extraLen = le16(b, p + 30)
            val cmtLen = le16(b, p + 32)
            val usize = le32(b, p + 24)
            if (nameLen > MaxNameLen || p + 46 + nameLen > b.length ||
                usize > MaxUncompressed) ok = false
            else {
              out += ZipEntry(
                new String(b, p + 46, nameLen, java.nio.charset.StandardCharsets.UTF_8),
                le16(b, p + 10), le32(b, p + 16),
                le32(b, p + 20).toInt, usize.toInt,
                le32(b, p + 42).toInt)
              p += 46 + nameLen + extraLen + cmtLen
              i += 1
            }
          }
        }
        if (ok) Some(out.toSeq) else None
      }
    }

  /** One entry's uncompressed bytes: local-header jump (skipping the
    * LOCAL name/extra lengths — they may differ from the central
    * copy), stored or raw-deflate, then usize + CRC-32 verification.
    */
  private[graft] def entryBytes(b: Array[Byte], e: ZipEntry): Option[Array[Byte]] = {
    if (e.off < 0 || e.off + 30 > b.length || le32(b, e.off) != 0x04034b50L) return None
    val dataOff = e.off + 30 + le16(b, e.off + 26) + le16(b, e.off + 28)
    if (e.csize < 0 || dataOff + e.csize.toLong > b.length) return None
    val raw =
      if (e.method == 0) {
        if (e.csize != e.usize) return None
        java.util.Arrays.copyOfRange(b, dataOff, dataOff + e.csize)
      } else if (e.method == 8) {
        val inf = new java.util.zip.Inflater(true)
        try {
          inf.setInput(b, dataOff, e.csize)
          val out = new Array[Byte](e.usize)
          var w = 0
          while (w < e.usize && !inf.finished()) {
            val k = inf.inflate(out, w, e.usize - w)
            if (k == 0 && inf.needsInput()) return None
            w += k
          }
          if (w != e.usize) return None
          out
        } catch {
          case _: java.util.zip.DataFormatException => return None
        } finally inf.end()
      } else return None
    val crc = new java.util.zip.CRC32
    crc.update(raw)
    if (crc.getValue != e.crc) None else Some(raw)
  }

  // ------------------------------------------------------ XML text rules

  /** The five predefined entities plus numeric character references —
    * the inverse of `xmlEscape` and of any standards-conforming
    * writer; a malformed reference stays literal.
    */
  private[graft] def xmlUnescape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else {
        val semi = s.indexOf(';', i + 1)
        val body = if (semi > i && semi - i <= 12) s.substring(i + 1, semi) else null
        val rep = body match {
          case null => null
          case "amp" => "&"
          case "lt" => "<"
          case "gt" => ">"
          case "quot" => "\""
          case "apos" => "'"
          case nr if nr.startsWith("#") =>
            val cp =
              try {
                if (nr.startsWith("#x") || nr.startsWith("#X"))
                  Integer.parseInt(nr.substring(2), 16)
                else Integer.parseInt(nr.substring(1))
              } catch { case _: NumberFormatException => -1 }
            if (cp > 0 && cp <= 0x10ffff && !(cp >= 0xd800 && cp <= 0xdfff))
              new String(Character.toChars(cp))
            else null
          case _ => null
        }
        if (rep == null) { sb.append(c); i += 1 }
        else { sb.append(rep); i = semi + 1 }
      }
    }
    sb.toString
  }

  private[graft] def xmlEscape(s: String): String = s.flatMap {
    case '&' => "&amp;"
    case '<' => "&lt;"
    case '>' => "&gt;"
    case '"' => "&quot;"
    case '\'' => "&apos;"
    case c => c.toString
  }

  /** One paragraph body's text: `<w:t>` runs concatenated with
    * entities decoded, `<w:tab/>` → tab, `<w:br/>` → newline,
    * `<w:delText>` spans skipped entirely.
    */
  private def paraText(s: String): String = {
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < s.length) {
      val lt = s.indexOf('<', i)
      if (lt < 0) i = s.length
      else {
        val gt = s.indexOf('>', lt + 1)
        if (gt < 0) i = s.length
        else {
          val selfClose = s.charAt(gt - 1) == '/'
          val rawEnd = if (selfClose) gt - 1 else gt
          val sp = s.indexWhere(ch => ch == ' ' || ch == '\t', lt + 1)
          val nameEnd = if (sp >= 0 && sp < rawEnd) sp else rawEnd
          val name = s.substring(lt + 1, nameEnd)
          name match {
            case "w:t" if !selfClose =>
              val end = s.indexOf("</w:t>", gt + 1)
              if (end < 0) i = s.length
              else { sb.append(xmlUnescape(s.substring(gt + 1, end))); i = end + 6 }
            case "w:tab" => sb.append('\t'); i = gt + 1
            case "w:br" => sb.append('\n'); i = gt + 1
            case "w:delText" if !selfClose =>
              val end = s.indexOf("</w:delText>", gt + 1)
              i = if (end < 0) s.length else end + 12
            case _ => i = gt + 1
          }
        }
      }
    }
    sb.toString
  }

  /** All `<w:p>` paragraphs of a document.xml, in document order. */
  private[graft] def extractDocxXml(xml: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < xml.length) {
      val p = xml.indexOf("<w:p", i)
      if (p < 0) i = xml.length
      else {
        val after = if (p + 4 < xml.length) xml.charAt(p + 4) else ' '
        if (after != '>' && after != ' ' && after != '/') i = p + 4
        else {
          val gt = xml.indexOf('>', p + 4)
          if (gt < 0) i = xml.length
          else if (xml.charAt(gt - 1) == '/') { out += ""; i = gt + 1 }
          else {
            val end = xml.indexOf("</w:p>", gt + 1)
            if (end < 0) i = xml.length
            else { out += paraText(xml.substring(gt + 1, end)); i = end + 6 }
          }
        }
      }
    }
    out.toSeq
  }

  // --------------------------------------------------------------- encode

  /** Body paragraphs from raw text — 8-word lines, the pure word
    * arithmetic the oracle replays (`[ \t\r\n]+` split, empties
    * dropped, pattern shared verbatim with the SQL side).
    */
  private[graft] def paragraphsOf(text: String): Seq[String] =
    text.split("[ \t\r\n]+").filter(_.nonEmpty).grouped(8)
      .map(_.mkString(" ")).toSeq

  /** The planted final paragraph: entity round trip (`& < > " '`), an
    * in-paragraph tab and line break, and the doc id.
    */
  private[graft] def markerParagraph(id: Long): String =
    "Amp & lt < gt > quot \" apos ' tab\tbreak\nfin " + id

  /** One paragraph's WordprocessingML: text segments as preserved
    * `<w:t>` runs, tabs and newlines as their run elements.
    */
  private def paraXml(p: String): String = {
    val sb = new java.lang.StringBuilder("<w:p>")
    val seg = new java.lang.StringBuilder
    def flush(): Unit = if (seg.length > 0) {
      sb.append("<w:r><w:t xml:space=\"preserve\">")
        .append(xmlEscape(seg.toString)).append("</w:t></w:r>")
      seg.setLength(0)
    }
    p.foreach {
      case '\t' => flush(); sb.append("<w:r><w:tab/></w:r>")
      case '\n' => flush(); sb.append("<w:r><w:br/></w:r>")
      case c => seg.append(c)
    }
    flush()
    sb.append("</w:p>").toString
  }

  /** A real three-entry DOCX: stored `[Content_Types].xml`, a deflated
    * `word/styles.xml` DECOY (its text must never leak), and
    * `word/document.xml` — deflated for even ids, stored for odd, so
    * the q143 hash is method-independent. The marker paragraph also
    * carries a `<w:delText>` tracked-change span the extractor must
    * skip.
    */
  private[graft] def buildDocx(id: Long, text: String): Array[Byte] = {
    val paras = paragraphsOf(text) :+ markerParagraph(id)
    val marker = paraXml(paras.last)
    val withDel = marker.substring(0, marker.length - "</w:p>".length) +
      "<w:del><w:r><w:delText xml:space=\"preserve\">REMOVED " + id +
      "</w:delText></w:r></w:del></w:p>"
    val body = (paras.init.map(paraXml) :+ withDel).mkString
    val docXml =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
        "<w:document xmlns:w=\"http://schemas.openxmlformats.org/wordprocessingml/2006/main\">" +
        "<w:body>" + body + "<w:sectPr/></w:body></w:document>"
    val ctXml =
      "<?xml version=\"1.0\" encoding=\"UTF-8\"?><Types xmlns=\"http://schemas.openxmlformats.org/package/2006/content-types\">" +
        "<Default Extension=\"xml\" ContentType=\"application/xml\"/></Types>"
    val stylesXml =
      "<?xml version=\"1.0\"?><w:styles xmlns:w=\"x\"><w:style><w:name w:val=\"Normal\"/>" +
        "<w:p><w:r><w:t>DECOY " + id + "</w:t></w:r></w:p></w:style></w:styles>"
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    buildZip(Seq(
      ("[Content_Types].xml", ctXml.getBytes(utf8), false),
      ("word/styles.xml", stylesXml.getBytes(utf8), true),
      ("word/document.xml", docXml.getBytes(utf8), id % 2 == 0)))
  }

  /** Write a real ZIP: local headers + data, central directory, EOCD. */
  private[graft] def buildZip(entries: Seq[(String, Array[Byte], Boolean)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def u32(v: Long): Unit = {
      bos.write((v & 0xff).toInt); bos.write(((v >> 8) & 0xff).toInt)
      bos.write(((v >> 16) & 0xff).toInt); bos.write(((v >> 24) & 0xff).toInt)
    }
    val cds = entries.map { case (name, data, deflate) =>
      val crc = new java.util.zip.CRC32
      crc.update(data)
      val stored =
        if (!deflate) data
        else {
          val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
          d.setInput(data); d.finish()
          val buf = new java.io.ByteArrayOutputStream()
          val tmp = new Array[Byte](4096)
          while (!d.finished()) buf.write(tmp, 0, d.deflate(tmp))
          d.end()
          buf.toByteArray
        }
      val nameB = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val off = bos.size()
      u32(0x04034b50L); u16(20); u16(0); u16(if (deflate) 8 else 0)
      u16(0); u16(0x21) // modtime/moddate: fixed epoch-ish stamp
      u32(crc.getValue); u32(stored.length.toLong); u32(data.length.toLong)
      u16(nameB.length); u16(0)
      bos.write(nameB); bos.write(stored)
      (nameB, deflate, crc.getValue, stored.length, data.length, off)
    }
    val cdOff = bos.size()
    cds.foreach { case (nameB, deflate, crc, csize, usize, off) =>
      u32(0x02014b50L); u16(20); u16(20); u16(0); u16(if (deflate) 8 else 0)
      u16(0); u16(0x21); u32(crc); u32(csize.toLong); u32(usize.toLong)
      u16(nameB.length); u16(0); u16(0); u16(0); u16(0); u32(0)
      u32(off.toLong); bos.write(nameB)
    }
    val cdSize = bos.size() - cdOff
    u32(0x06054b50L); u16(0); u16(0); u16(cds.length); u16(cds.length)
    u32(cdSize.toLong); u32(cdOff.toLong); u16(0)
    bos.toByteArray
  }

  // ----------------------------------------------------------------- q143

  /** Full-container extraction; the error-as-value contract. */
  private[graft] def extractDocx(docId: Long, b: Array[Byte]): DocxInfo = {
    def dead(status: String) = DocxInfo(docId, status, 0, "", 0, "")
    centralDirectory(b) match {
      case None => dead("not-zip")
      case Some(entries) =>
        entries.find(_.name == "word/document.xml") match {
          case None => dead("no-document")
          case Some(doc) =>
            entryBytes(b, doc) match {
              case None => dead("bad-entry")
              case Some(raw) =>
                val paras = extractDocxXml(
                  new String(raw, java.nio.charset.StandardCharsets.UTF_8))
                DocxInfo(docId, "ok", entries.length,
                  if (doc.method == 8) "deflate" else "stored",
                  paras.length, paras.mkString("\n"))
            }
        }
    }
  }

  /** q143: the office-document front door end-to-end — build a real
    * three-entry DOCX per document, walk the central directory, jump
    * local headers, inflate + CRC-verify `word/document.xml`, and
    * apply the WordprocessingML text rules; paragraph count,
    * character count, and the extracted-text sha all replayed by the
    * oracle from pure (doc_id, text) word arithmetic.
    */
  def q143DocxExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) => extractDocx(id, buildDocx(id, t)) })
      .toDF()
      .select(col("doc_id"), col("status"),
        col("n_entries").cast("long").as("n_entries"),
        col("method"),
        col("n_paragraphs").cast("long").as("n_paragraphs"),
        length(col("text")).cast("long").as("n_chars"),
        sha2(col("text"), 256).as("text_sha"))
      .orderBy(col("doc_id"))
  }
}
