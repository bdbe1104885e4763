package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PDF text extraction — after HTML, the second-biggest text source a
  * real crawl pipeline mines. Dependency-free subset of ISO 32000
  * (PDF 1.4 class): classic cross-reference TABLE walk (`startxref` →
  * `xref` → object offsets), object/dictionary parse, content streams
  * either plain or `/FlateDecode` (zlib via JDK `Inflater` — the
  * PNG/WebP/WARC precedent), and `BT … ET` text blocks with the
  * `Tj`/`TJ`/`'` show operators and `Td`/`TD`/`T*` line moves, emitted
  * in document order (page order from `/Kids`, operator order within a
  * page).
  *
  * The codec discipline throughout (`Jpeg`/`Webp`/`WarcOps`):
  * error-as-value — an encrypted file, a broken xref, an unsupported
  * filter, a lying `/Length`, or a corrupt deflate stream yields a
  * typed dead-letter `status` (never a throw), and a bad CONTENT
  * stream drops only its own page's text while the rest of the
  * document survives; allocation-bounded — stream output is capped
  * BEFORE trusting any header field.
  *
  * String semantics: PDF `(…)` literals are byte strings with the
  * `\( \) \\ \n \r \t \ddd` escapes and balanced-paren nesting; the
  * unescaped bytes decode as UTF-8 (our corpus is ASCII + escapes).
  * Line assembly: every show operator appends its string; a line move
  * (`Td`/`TD`/`T*`/`'`) inserts one newline iff text was already shown
  * in the block (leading positioning moves don't open with a blank
  * line); pages join with a newline — deterministic, so the q136
  * oracle replays the EXPECTED text straight from (doc_id, text) (the
  * q46 encode→decode collapse; the parse itself cancels out).
  *
  * Scale shape (100 TB): a per-row byte walker via `mapPartitions`,
  * zero exchange before the output sort; per-document work linear in
  * file size, bounded decompression.
  */
object PdfOps {

  /** Per-stream inflate cap — a compression-bomb content stream drops
    * as `bad-stream` instead of allocating.
    */
  private val MaxStreamBytes = 1 << 24

  final case class PdfText(
      doc_id: Long, status: String, n_pages: Int, n_streams: Int, text: String)

  // ---------------------------------------------------------------- parse

  /** Resolve ASCII `bytes` once; all offsets are byte offsets. */
  private final class Cursor(val b: Array[Byte]) {
    val s = new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
    def utf8(from: Int, until: Int): String =
      new String(b, from, until - from, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Balanced `<< … >>` span at or after `from` in an arbitrary
    * string; returns (dictString, endOffset) or None.
    */
  private def dictFromString(s: String, from: Int): Option[(String, Int)] = {
    val open = s.indexOf("<<", from)
    if (open < 0) return None
    var depth = 0
    var i = open
    while (i < s.length - 1) {
      if (s.startsWith("<<", i)) { depth += 1; i += 2 }
      else if (s.startsWith(">>", i)) {
        depth -= 1; i += 2
        if (depth == 0) return Some((s.substring(open, i), i))
      } else i += 1
    }
    None
  }

  /** Parse one object's dictionary span `<< … >>` starting at or after
    * `from` (must precede any `stream` keyword); returns (dictString,
    * endOffset) or None.
    */
  private def dictAt(c: Cursor, from: Int): Option[(String, Int)] =
    dictFromString(c.s, from)

  private val RefRe = """/(\w+)\s+(\d+)\s+0\s+R""".r
  private val IntRe = """/(\w+)\s+(\d+)(?![\d.])""".r
  private val NameRe = """/(\w+)\s*/(\w+)""".r
  private val ArrRe = """/(\w+)\s*\[([^\]]*)\]""".r

  private def dictIntArray(d: String, key: String): Option[Seq[Long]] =
    ArrRe.findAllMatchIn(d).find(_.group(1) == key).map(m =>
      """-?\d+""".r.findAllIn(m.group(2)).map(_.toLong).toSeq)

  private def dictRef(d: String, key: String): Option[Int] =
    RefRe.findAllMatchIn(d).find(_.group(1) == key).map(_.group(2).toInt)
  private def dictInt(d: String, key: String): Option[Long] =
    IntRe.findAllMatchIn(d).filter(_.group(1) == key)
      .map(_.group(2).toLong).toSeq.headOption
  private def dictName(d: String, key: String): Option[String] =
    NameRe.findAllMatchIn(d).find(_.group(1) == key).map(_.group(2))
  private def dictKids(d: String): Seq[Int] = {
    val k = d.indexOf("/Kids")
    if (k < 0) return Nil
    val open = d.indexOf('[', k)
    val close = d.indexOf(']', open)
    if (open < 0 || close < 0) return Nil
    """(\d+)\s+0\s+R""".r.findAllMatchIn(d.substring(open, close))
      .map(_.group(1).toInt).toSeq
  }

  /** Direct-/Length Flate-or-plain stream payload of the object whose
    * dict ends at `dictEnd`; None on any lie.
    */
  private def streamPayload(c: Cursor, d: String, dictEnd: Int): Option[Array[Byte]] = {
    val kw = c.s.indexOf("stream", dictEnd)
    val len = dictInt(d, "Length").getOrElse(-1L)
    if (kw < 0 || len < 0 || len > MaxStreamBytes) return None
    var ds = kw + 6
    if (ds < c.s.length && c.s(ds) == '\r') ds += 1
    if (ds < c.s.length && c.s(ds) == '\n') ds += 1
    if (ds + len > c.s.length) return None
    if (dictName(d, "Filter").contains("FlateDecode"))
      inflateZlib(c.b, ds, len.toInt)
    else Some(java.util.Arrays.copyOfRange(c.b, ds, (ds + len).toInt))
  }

  /** Object locations + trailer from EITHER xref form: the classic
    * table (PDF 1.0–1.4) or the PDF 1.5 CROSS-REFERENCE STREAM
    * (`/Type /XRef`, `/W`-width binary rows, default `/Index`,
    * Flate-compressed). Returns (direct offsets, compressed locations
    * `obj → (objstm, idx)`, trailer dict — for xref streams the
    * stream's own dict IS the trailer). None on any structural lie.
    */
  private def xrefOffsets(
      c: Cursor): Option[(Map[Int, Int], Map[Int, (Int, Int)], String)] = {
    val sx = c.s.lastIndexOf("startxref")
    if (sx < 0) return None
    val tail = c.s.substring(sx + 9).trim.takeWhile(_.isDigit)
    if (tail.isEmpty) return None
    val xo = tail.toLong
    if (xo < 0 || xo >= c.s.length) return None
    var p = xo.toInt
    if (!c.s.startsWith("xref", p)) {
      // PDF 1.5 cross-reference STREAM: an object at the offset
      return dictAt(c, p).flatMap { case (d, dictEnd) =>
        if (!dictName(d, "Type").contains("XRef")) None
        else {
          val w = dictIntArray(d, "W").getOrElse(return None)
          val size = dictInt(d, "Size").getOrElse(return None)
          if (w.length != 3 || w.exists(x => x < 0 || x > 4)) return None
          val index = dictIntArray(d, "Index")
            .getOrElse(Seq(0L, size))
          if (index.length % 2 != 0) return None
          streamPayload(c, d, dictEnd).flatMap { raw =>
            // real writers almost always PNG-predictor-filter xref
            // streams (/DecodeParms /Predictor >= 10): each row is
            // prefixed with a PNG filter-type byte; Up (2) adds the
            // previous row, None (0) passes through — the two filters
            // xref writers use. Other row filters dead-letter.
            val pred = """/Predictor\s+(\d+)""".r
              .findFirstMatchIn(d).map(_.group(1).toInt).getOrElse(1)
            val data: Array[Byte] =
              if (pred < 10) raw
              else {
                val cols = dictInt(d, "Columns").getOrElse(w.sum).toInt
                if (cols <= 0 || raw.length % (cols + 1) != 0) return None
                val nRows = raw.length / (cols + 1)
                val out = new Array[Byte](nRows * cols)
                var r = 0
                while (r < nRows) {
                  val ft = raw(r * (cols + 1)) & 0xff
                  var x = 0
                  while (x < cols) {
                    val v = raw(r * (cols + 1) + 1 + x) & 0xff
                    out(r * cols + x) = (ft match {
                      case 0 => v
                      case 2 => v + (if (r > 0) out((r - 1) * cols + x) & 0xff else 0)
                      case _ => return None
                    }).toByte
                    x += 1
                  }
                  r += 1
                }
                out
              }
            val rowLen = w.sum.toInt
            val direct = scala.collection.mutable.Map.empty[Int, Int]
            val compressed = scala.collection.mutable.Map.empty[Int, (Int, Int)]
            var q = 0
            def field(width: Int): Long = {
              var v = 0L
              var k = 0
              while (k < width) { v = (v << 8) | (data(q) & 0xffL); q += 1; k += 1 }
              v
            }
            index.grouped(2).foreach { case Seq(start, count) =>
              if (count < 0 || count > 100000) return None
              var i = 0
              while (i < count) {
                if (q + rowLen > data.length) return None
                val t = if (w(0) == 0) 1L else field(w(0).toInt)
                val f2 = field(w(1).toInt)
                val f3 = field(w(2).toInt)
                val objNum = (start + i).toInt
                t match {
                  case 1L => direct(objNum) = f2.toInt
                  case 2L => compressed(objNum) = (f2.toInt, f3.toInt)
                  case _ => () // type 0: free
                }
                i += 1
              }
            }
            Some((direct.toMap, compressed.toMap, d))
          }
        }
      }
    }
    p += 4
    while (p < c.s.length && (c.s(p) == '\r' || c.s(p) == '\n')) p += 1
    val out = scala.collection.mutable.Map.empty[Int, Int]
    var done = false
    while (!done) {
      val eol = c.s.indexOf('\n', p)
      if (eol < 0) return None
      val header = c.s.substring(p, eol).trim
      if (header == "trailer" || header.startsWith("trailer")) {
        p = p + header.indexOf("trailer") + 7
        done = true
      } else {
        val parts = header.split("\\s+")
        if (parts.length != 2 || !parts.forall(_.forall(_.isDigit))) return None
        val (start, n) = (parts(0).toInt, parts(1).toInt)
        if (n < 0 || n > 100000) return None
        p = eol + 1
        var i = 0
        while (i < n) {
          if (p + 18 > c.s.length) return None
          val off = c.s.substring(p, p + 10)
          val typ = c.s(p + 17)
          if (!off.forall(_.isDigit)) return None
          if (typ == 'n') out(start + i) = off.toInt
          p += 20
          i += 1
        }
      }
    }
    dictAt(c, p).map { case (trailer, _) =>
      (out.toMap, Map.empty[Int, (Int, Int)], trailer)
    }
  }

  /** Unescape one PDF string literal body (no outer parens). */
  private[graft] def unescapePdfString(raw: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < raw.length) {
      val ch = raw(i)
      if (ch == '\\' && i + 1 < raw.length) {
        raw(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case '(' => sb.append('('); i += 2
          case ')' => sb.append(')'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case d if d >= '0' && d <= '7' =>
            var j = i + 1
            var v = 0
            while (j < raw.length && j <= i + 3 && raw(j) >= '0' && raw(j) <= '7') {
              v = v * 8 + (raw(j) - '0'); j += 1
            }
            sb.append((v & 0xff).toChar); i = j
          case other => sb.append(other); i += 2 // unknown escape: literal
        }
      } else { sb.append(ch); i += 1 }
    }
    sb.toString
  }

  // ---------------------------------------------------------------- fonts

  /** Adobe-Glyph-List subset for `/Differences` glyph names, plus the
    * `uniXXXX` convention. A name outside this subset dead-letters the
    * DOCUMENT with `unsupported-glyph` (declared boundary: silently
    * guessing a glyph's Unicode would corrupt the text pipeline).
    */
  private val Agl: Map[String, String] = Map(
    "space" -> " ", "eacute" -> "é", "egrave" -> "è", "agrave" -> "à",
    "ccedilla" -> "ç", "adieresis" -> "ä", "odieresis" -> "ö",
    "udieresis" -> "ü", "ntilde" -> "ñ", "Euro" -> "€", "emdash" -> "—",
    "endash" -> "–", "bullet" -> "•", "quotedblleft" -> "“",
    "quotedblright" -> "”", "quoteright" -> "’", "oslash" -> "ø",
    "aring" -> "å", "eth" -> "ð", "thorn" -> "þ", "germandbls" -> "ß",
    "Lslash" -> "Ł", "lslash" -> "ł", "OE" -> "Œ", "oe" -> "œ")

  private def glyphToUnicode(name: String): Option[String] =
    Agl.get(name).orElse {
      if (name.startsWith("uni") && name.length == 7 &&
        name.drop(3).forall(c => (c >= '0' && c <= '9') ||
          (c >= 'A' && c <= 'F')))
        Some(Integer.parseInt(name.substring(3), 16).toChar.toString)
      else None
    }

  /** `/Differences [ code /name … ]` → byte-code → Unicode (RFC: ISO
    * 32000 §9.6.6.3 — an integer sets the next code, each name consumes
    * one). Left = typed dead-letter reason.
    */
  private[graft] def parseDifferences(enc: String): Either[String, Map[Int, String]] = {
    val k = enc.indexOf("/Differences")
    if (k < 0) return Right(Map.empty)
    val open = enc.indexOf('[', k)
    val close = if (open < 0) -1 else enc.indexOf(']', open)
    if (open < 0 || close < 0) return Left("unsupported-encoding")
    val out = Map.newBuilder[Int, String]
    var code = -1
    for (m <- """(\d+)|/([A-Za-z0-9.]+)""".r
        .findAllMatchIn(enc.substring(open + 1, close))) {
      if (m.group(1) != null) code = m.group(1).toInt
      else {
        if (code < 0 || code > 255) return Left("unsupported-encoding")
        glyphToUnicode(m.group(2)) match {
          case Some(s) => out += code -> s; code += 1
          case None => return Left("unsupported-glyph")
        }
      }
    }
    Right(out.result())
  }

  /** A font's decode table plus its CODE WIDTH in bytes: 1 for simple
    * fonts (`/Differences`, single-byte CMaps), 2 for CID-keyed Type0
    * fonts (Identity-H class — shown strings consume two bytes per
    * code, and the ToUnicode CMap is the whole decode; no
    * `/CIDToGIDMap` is needed because text extraction never touches
    * glyphs).
    */
  private[graft] final case class FontMap(width: Int, m: Map[Int, String])

  /** `/ToUnicode` CMap walk: `bfchar` pairs and `bfrange` entries in
    * BOTH the contiguous (`<lo> <hi> <dstBase>`) and the ARRAY
    * (`<lo> <hi> [<dst> …]`) forms, over single-byte OR 2-byte
    * codespaces (the CID shape — every source token must carry the
    * codespace's width). Declared dead-letters (`unsupported-cmap`):
    * mixed-width or >2-byte codespaces, width-inconsistent source
    * codes, an array whose length disagrees with its range, a range
    * wider than 4096 codes, and malformed hex.
    */
  private[graft] def parseToUnicode(cmap: String): Either[String, FontMap] = {
    val hexTok = """<([0-9A-Fa-f]+)>""".r
    // codespace: all endpoints one byte → width 1, all two bytes →
    // width 2 (the CID shape); anything mixed or wider dead-letters
    var width = 0
    var p = cmap.indexOf("begincodespacerange")
    while (p >= 0) {
      val e = cmap.indexOf("endcodespacerange", p)
      if (e < 0) return Left("unsupported-cmap")
      for (m <- hexTok.findAllMatchIn(cmap.substring(p, e))) {
        val w = m.group(1).length match {
          case 2 => 1
          case 4 => 2
          case _ => return Left("unsupported-cmap")
        }
        if (width == 0) width = w
        else if (width != w) return Left("unsupported-cmap")
      }
      p = cmap.indexOf("begincodespacerange", e)
    }
    if (width == 0) width = 1 // no codespacerange: the simple-font default
    val srcLen = 2 * width
    val out = Map.newBuilder[Int, String]
    def dstString(hx: String): Option[String] =
      if (hx.length % 4 != 0 || hx.isEmpty) None
      else Some(hx.grouped(4)
        .map(u => Integer.parseInt(u, 16).toChar).mkString)
    // bfchar sections
    p = cmap.indexOf("beginbfchar")
    while (p >= 0) {
      val e = cmap.indexOf("endbfchar", p)
      if (e < 0) return Left("unsupported-cmap")
      val toks = hexTok.findAllMatchIn(cmap.substring(p, e)).map(_.group(1)).toSeq
      if (toks.length % 2 != 0) return Left("unsupported-cmap")
      for (Seq(src, dst) <- toks.grouped(2)) {
        if (src.length != srcLen) return Left("unsupported-cmap")
        dstString(dst) match {
          case Some(s) => out += Integer.parseInt(src, 16) -> s
          case None => return Left("unsupported-cmap")
        }
      }
      p = cmap.indexOf("beginbfchar", e)
    }
    // bfrange sections: array-form entries resolve first, then the
    // remaining tokens parse as contiguous triples
    val arrEntry =
      ("""<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*\[((?:\s*<[0-9A-Fa-f]+>)+)\s*\]""").r
    p = cmap.indexOf("beginbfrange")
    while (p >= 0) {
      val e = cmap.indexOf("endbfrange", p)
      if (e < 0) return Left("unsupported-cmap")
      var body = cmap.substring(p + "beginbfrange".length, e)
      for (m <- arrEntry.findAllMatchIn(body)) {
        val (lo, hi) = (m.group(1), m.group(2))
        if (lo.length != srcLen || hi.length != srcLen)
          return Left("unsupported-cmap")
        val l = Integer.parseInt(lo, 16); val h = Integer.parseInt(hi, 16)
        val dsts = hexTok.findAllMatchIn(m.group(3)).map(_.group(1)).toSeq
        if (h < l || dsts.length != h - l + 1) return Left("unsupported-cmap")
        for ((dst, i) <- dsts.zipWithIndex) dstString(dst) match {
          case Some(s) => out += (l + i) -> s
          case None => return Left("unsupported-cmap")
        }
      }
      body = arrEntry.replaceAllIn(body, " ")
      if (body.contains("[") || body.contains("]"))
        return Left("unsupported-cmap") // a torn array form
      val toks = hexTok.findAllMatchIn(body).map(_.group(1)).toSeq
      if (toks.length % 3 != 0) return Left("unsupported-cmap")
      for (Seq(lo, hi, dst) <- toks.grouped(3)) {
        if (lo.length != srcLen || hi.length != srcLen || dst.length != 4)
          return Left("unsupported-cmap")
        val l = Integer.parseInt(lo, 16); val h = Integer.parseInt(hi, 16)
        val base = Integer.parseInt(dst, 16)
        if (h < l || h - l > 4095) return Left("unsupported-cmap")
        var cdd = l
        while (cdd <= h) { out += cdd -> (base + cdd - l).toChar.toString; cdd += 1 }
      }
      p = cmap.indexOf("beginbfrange", e)
    }
    Right(FontMap(width, out.result()))
  }

  /** Decode a shown string's BYTES (Latin-1 chars carry them 1:1)
    * through the current font. Width 1: mapped codes via `/ToUnicode`
    * / `/Differences`, unmapped codes pass through as Latin-1. Width 2
    * (CID): bytes pair big-endian into codes; an unmapped code falls
    * back to the Identity reading (code == code point — the best an
    * extractor can do for Identity-H without a ToUnicode entry), and
    * an ODD byte count raises the bad bit (`_2`) — a torn CID string
    * is a bad stream, never a silent half-code. A font with no mapping
    * at all keeps the pre-font behavior — the raw bytes re-decode as
    * UTF-8.
    */
  private def decodeShown(
      raw: String, font: Option[FontMap]): (String, Boolean) =
    font match {
      case Some(FontMap(1, m)) =>
        (raw.iterator.map(ch => m.getOrElse(ch.toInt, ch.toString)).mkString,
          false)
      case Some(FontMap(_, m)) =>
        val sb = new StringBuilder
        var i = 0
        while (i + 1 < raw.length) {
          val code = (raw(i).toInt << 8) | raw(i + 1).toInt
          sb.append(m.getOrElse(code, code.toChar.toString))
          i += 2
        }
        (sb.toString, i < raw.length)
      case None =>
        (new String(raw.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1),
          java.nio.charset.StandardCharsets.UTF_8), false)
    }

  /** Extract shown text from one decoded content stream per the line
    * assembly rule in the scaladoc. `content` is the stream's BYTES in
    * the Latin-1 view (offsets = bytes); `fonts` maps resource names
    * (`F1`) to byte→Unicode tables — the current font follows the
    * `/Fx … Tf` selections.
    */
  private[graft] def contentText(
      content: String,
      fonts: Map[String, FontMap] = Map.empty): String =
    contentTextChecked(content, fonts)._1

  /** `contentText` plus the error-as-value bit: `_2` is true when a
    * shown string was structurally bad (a hex literal carrying non-hex
    * characters, or a CID string with an odd byte count) — the caller
    * folds it into the document's `bad-stream` status instead of
    * silently showing nothing.
    */
  private[graft] def contentTextChecked(
      content: String,
      fonts: Map[String, FontMap] = Map.empty): (String, Boolean) = {
    var badShown = false
    val sb = new StringBuilder
    var shown = false // text shown since last newline in this block
    var i = 0
    var lastName = "" // most recent name token (the Tf operand)
    var curFont: Option[FontMap] = None
    def newline(): Unit = if (shown) { sb.append('\n'); shown = false }
    def show(ds: (String, Boolean)): Unit = {
      if (ds._2) badShown = true
      sb.append(ds._1); shown = ds._1.nonEmpty || shown
    }
    while (i < content.length) {
      val bt = content.indexOf("BT", i)
      if (bt < 0) { i = content.length }
      else {
        var p = bt + 2
        var inBlock = true
        shown = false
        while (inBlock && p < content.length) {
          content(p) match {
            case '(' =>
              // balanced-paren string literal with escapes
              var depth = 1
              var q = p + 1
              val raw = new StringBuilder
              while (depth > 0 && q < content.length) {
                val ch = content(q)
                if (ch == '\\' && q + 1 < content.length) {
                  raw.append(ch).append(content(q + 1)); q += 2
                } else {
                  if (ch == '(') depth += 1
                  else if (ch == ')') depth -= 1
                  if (depth > 0) raw.append(ch)
                  q += 1
                }
              }
              // the operator after the string (or after the ] of a TJ
              // array) decides; a bare string inside [ ] shows directly
              show(decodeShown(unescapePdfString(raw.toString), curFont))
              p = q
            case '<' if !content.startsWith("<<", p) =>
              // hex string literal (odd final digit pads 0 per spec)
              val close = content.indexOf('>', p)
              if (close < 0) { p = content.length }
              else {
                val hx0 = content.substring(p + 1, close)
                  .filterNot(c => c == ' ' || c == '\r' || c == '\n' || c == '\t')
                val hx = if (hx0.length % 2 == 1) hx0 + "0" else hx0
                if (hx.forall(c => (c >= '0' && c <= '9') ||
                  (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')))
                  show(decodeShown(hx.grouped(2)
                    .map(b => Integer.parseInt(b, 16).toChar).mkString, curFont))
                else badShown = true // non-hex in a hex literal: bad stream
                p = close + 1
              }
            case '<' => p += 2 // inline dict: step over '<<'
            case '/' =>
              var q = p + 1
              while (q < content.length && (content(q).isLetterOrDigit ||
                content(q) == '.')) q += 1
              lastName = content.substring(p + 1, q)
              p = q
            case 'T' if content.startsWith("Tf", p) =>
              curFont = fonts.get(lastName); p += 2
            case 'E' if content.startsWith("ET", p) =>
              inBlock = false; p += 2
            case 'T' if content.startsWith("T*", p) =>
              newline(); p += 2
            case 'T' if content.startsWith("Td", p) ||
              content.startsWith("TD", p) =>
              newline(); p += 2
            case '\'' => newline(); p += 1
            case _ => p += 1
          }
        }
        i = p
      }
    }
    (sb.toString, badShown)
  }

  /** Inflate a zlib stream with the output cap; None on corruption or
    * bomb.
    */
  private def inflateZlib(b: Array[Byte], off: Int, len: Int): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(b, off, len)
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](1 << 16)
      var total = 0L
      while (!inf.finished()) {
        val w =
          try inf.inflate(buf)
          catch { case _: java.util.zip.DataFormatException => return None }
        if (w > 0) {
          total += w
          if (total > MaxStreamBytes) return None
          bos.write(buf, 0, w)
        } else if (!inf.finished() && inf.needsInput()) return None
      }
      Some(bos.toByteArray)
    } finally inf.end()
  }

  /** Full-document text extraction; the error-as-value contract. */
  private[graft] def extractPdf(docId: Long, bytes: Array[Byte]): PdfText = {
    val c = new Cursor(bytes)
    if (!c.s.startsWith("%PDF-"))
      return PdfText(docId, "not-pdf", 0, 0, "")
    xrefOffsets(c) match {
      case None => PdfText(docId, "bad-xref", 0, 0, "")
      case Some((offsets, compressed, trailer)) =>
        if (trailer.contains("/Encrypt"))
          return PdfText(docId, "encrypted", 0, 0, "")
        // object streams (/Type /ObjStm): inflated once, header pairs
        // "objnum offset" locate each packed object body after /First
        val objStmCache = scala.collection.mutable.Map.empty[Int, Option[(String, Map[Int, Int], Int)]]
        def objStm(num: Int): Option[(String, Map[Int, Int], Int)] =
          objStmCache.getOrElseUpdate(num, {
            offsets.get(num).flatMap(o => dictAt(c, o)).flatMap { case (d, de) =>
              if (!dictName(d, "Type").contains("ObjStm")) None
              else for {
                n <- dictInt(d, "N")
                first <- dictInt(d, "First")
                data <- streamPayload(c, d, de)
              } yield {
                val text = new String(data,
                  java.nio.charset.StandardCharsets.ISO_8859_1)
                val nums = """\d+""".r.findAllIn(
                  text.substring(0, math.min(first.toInt, text.length)))
                  .map(_.toInt).toSeq
                val pairs = nums.grouped(2).collect {
                  case Seq(on, off) => on -> off
                }.toMap
                (text, pairs, first.toInt)
              }
            }
          })
        def objDict(num: Int): Option[(String, Int)] =
          offsets.get(num).filter(o => o >= 0 && o < c.s.length)
            .flatMap(o => dictAt(c, o))
            .orElse(compressed.get(num).flatMap { case (stmNum, _) =>
              objStm(stmNum).flatMap { case (text, pairs, first) =>
                pairs.get(num).flatMap { rel =>
                  val start = first + rel
                  if (start < 0 || start >= text.length) None
                  else dictFromString(text, start).map { case (d, _) => (d, -1) }
                }
              }
            })
        val rootDict = dictRef(trailer, "Root").flatMap(objDict)
        val pagesDict = rootDict.flatMap { case (d, _) =>
          dictRef(d, "Pages").flatMap(objDict)
        }
        pagesDict match {
          case None => PdfText(docId, "bad-structure", 0, 0, "")
          case Some((pd, _)) =>
            val kids = dictKids(pd)
            if (kids.isEmpty) return PdfText(docId, "bad-structure", 0, 0, "")
            var nStreams = 0
            var bad = false
            var fontError: Option[String] = None
            // page /Resources → /Font → per-name byte→Unicode tables
            // (each dict inline or indirect; typed dead-letters bubble)
            def inlineDictOf(d: String, key: String): Option[String] = {
              val k = d.indexOf("/" + key)
              if (k < 0) None
              else {
                val open = d.indexOf("<<", k)
                if (open < 0 || d.substring(k + key.length + 1, open).trim.nonEmpty)
                  None
                else dictFromString(d, open).map(_._1)
              }
            }
            def subDict(d: String, key: String): Option[String] =
              dictRef(d, key).flatMap(n => objDict(n).map(_._1))
                .orElse(inlineDictOf(d, key))
            def fontTable(num: Int): Either[String, FontMap] =
              objDict(num) match {
                case None => Left("bad-structure")
                case Some((fd, _)) =>
                  val diffs = subDict(fd, "Encoding") match {
                    case None => Right(Map.empty[Int, String])
                    case Some(e) => parseDifferences(e)
                  }
                  val toUni = dictRef(fd, "ToUnicode") match {
                    case None => Right(FontMap(1, Map.empty[Int, String]))
                    case Some(tn) =>
                      offsets.get(tn).flatMap(o => dictAt(c, o))
                        .flatMap { case (d, de) => streamPayload(c, d, de) } match {
                        case None => Left("bad-stream")
                        case Some(bytes) => parseToUnicode(new String(bytes,
                          java.nio.charset.StandardCharsets.ISO_8859_1))
                      }
                  }
                  // ToUnicode wins over /Differences per ISO 32000
                  // §9.10.2; /Differences on a CID (2-byte) font is a
                  // shape that cannot be reconciled — typed dead-letter
                  (diffs, toUni) match {
                    case (Left(r), _) => Left(r)
                    case (_, Left(r)) => Left(r)
                    case (Right(dm), Right(um)) =>
                      if (um.width == 1) Right(FontMap(1, dm ++ um.m))
                      else if (dm.isEmpty) Right(um)
                      else Left("unsupported-cmap")
                  }
              }
            def pageFonts(pgd: String): Map[String, FontMap] =
              subDict(pgd, "Resources").flatMap(rd => subDict(rd, "Font")) match {
                case None => Map.empty
                case Some(fdict) =>
                  """/(\w+)\s+(\d+)\s+0\s+R""".r.findAllMatchIn(fdict)
                    .filterNot(_.group(1) == "Font")
                    .flatMap { m =>
                      fontTable(m.group(2).toInt) match {
                        case Right(t) => Some(m.group(1) -> t)
                        case Left(reason) =>
                          if (fontError.isEmpty) fontError = Some(reason)
                          None
                      }
                    }.toMap
              }
            val pageTexts = kids.flatMap { pg =>
              objDict(pg) match {
                case None => bad = true; None
                case Some((pgd, _)) =>
                  val fonts = pageFonts(pgd)
                  dictRef(pgd, "Contents").flatMap(cn =>
                    offsets.get(cn).flatMap { co =>
                      dictAt(c, co).flatMap { case (sd, dictEnd) =>
                        // stream payload: `stream` EOL + /Length bytes
                        val kw = c.s.indexOf("stream", dictEnd)
                        val lenOpt = dictInt(sd, "Length").orElse(
                          // indirect length: N 0 R → integer object
                          dictRef(sd, "Length").flatMap(ln =>
                            offsets.get(ln).flatMap { lo =>
                              val m = """\d+\s+0\s+obj\s+(\d+)""".r
                                .findFirstMatchIn(c.s.substring(lo,
                                  math.min(lo + 64, c.s.length)))
                              m.map(_.group(1).toLong)
                            }))
                        lenOpt match {
                          case Some(len) if kw >= 0 =>
                            var ds = kw + 6
                            if (ds < c.s.length && c.s(ds) == '\r') ds += 1
                            if (ds < c.s.length && c.s(ds) == '\n') ds += 1
                            val de = ds + len
                            // a lying Length misses the endstream keyword
                            val okSpan = len >= 0 && len <= Int.MaxValue &&
                              de <= c.s.length &&
                              c.s.indexOf("endstream", de.toInt).toLong == {
                                var q = de
                                while (q < c.s.length &&
                                  (c.s(q.toInt) == '\r' || c.s(q.toInt) == '\n')) q += 1
                                q
                              }
                            if (!okSpan) { bad = true; None }
                            else {
                              nStreams += 1
                              val flate = dictName(sd, "Filter").contains("FlateDecode")
                              // Latin-1 view: string literals keep their
                              // BYTES for the font decode; fonts without
                              // a table re-decode them as UTF-8
                              val data: Option[String] =
                                if (!flate) Some(c.s.substring(ds, de.toInt))
                                else inflateZlib(c.b, ds, (de - ds).toInt)
                                  .map(new String(_,
                                    java.nio.charset.StandardCharsets.ISO_8859_1))
                              if (data.isEmpty) bad = true
                              data.map { s =>
                                val (t, badHex) = contentTextChecked(s, fonts)
                                if (badHex) bad = true
                                t
                              }
                            }
                          case _ => bad = true; None
                        }
                      }
                    })
              }
            }
            fontError match {
              case Some(reason) => PdfText(docId, reason, 0, 0, "")
              case None =>
                val status = if (bad) "bad-stream" else "ok"
                PdfText(docId, status, kids.length, nStreams,
                  pageTexts.mkString("\n"))
            }
        }
    }
  }

  // ---------------------------------------------------------------- encode

  /** PDF string-literal escape (corpus construction). */
  private[graft] def escapePdfString(s: String): String =
    s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")

  /** The constant decoded form of the q136 font line: `/Differences`
    * AGL names (é è € Ł), a `/ToUnicode` bfrange (Δ Ε Ζ Η), and a
    * bfchar shown as a HEX string (❤) — the oracle replays it
    * verbatim.
    */
  private[graft] val FontLine = "éè€Ł ΔΕΖΗ ❤"

  /** Deterministic two-page PDF: page 1 carries the title + body split
    * across `Tj` and a kerned `TJ` array inside a FLATE stream; page 2
    * is a PLAIN stream whose fixed line exercises every escape class
    * (parens, backslash, octal) and then switches to font `/F2` —
    * carrying `/Encoding /Differences` (AGL glyph names) and a
    * `/ToUnicode` CMap (bfrange + bfchar, the bfchar shown as a hex
    * string) — for a planted non-ASCII line the byte codes only
    * decode correctly THROUGH the font tables. Encoder lives in main
    * for corpus construction — the Jpeg/Gif/WARC precedent.
    */
  private[graft] def buildPdf(
      docId: Long, bodyA: String, bodyB1: String, bodyB2: String): Array[Byte] =
    buildPdfFull(docId, bodyA, bodyB1, bodyB2, cid = false)

  /** The constant decoded form of the q181 CID line: a contiguous
    * 2-byte bfrange (一丁丂七), an ARRAY-form bfrange (日本語), and
    * wide bfchars (the space + あ) — all shown through one Identity-H
    * Type0 font as a single hex string.
    */
  private[graft] val CidLine = "一丁丂七 日本語 あ"

  /** `buildPdf` plus a CID-keyed Type0 font on page 2: `/Encoding
    * /Identity-H`, a `/DescendantFonts` CIDFontType2 (present for
    * shape; extraction never reads it), and a 2-byte `/ToUnicode` CMap
    * carrying a 2-byte codespacerange, a contiguous bfrange, an
    * ARRAY-form bfrange, and wide bfchars — the professional-writer
    * layout for CJK text.
    */
  private[graft] def buildPdfCid(
      docId: Long, bodyA: String, bodyB1: String, bodyB2: String): Array[Byte] =
    buildPdfFull(docId, bodyA, bodyB1, bodyB2, cid = true)

  private def buildPdfFull(
      docId: Long, bodyA: String, bodyB1: String, bodyB2: String,
      cid: Boolean): Array[Byte] = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val content1 =
      s"BT /F1 12 Tf 72 720 Td (Doc $docId) Tj T* (${escapePdfString(bodyA)}) Tj " +
        s"T* [(${escapePdfString(bodyB1)}) -250 (${escapePdfString(bodyB2)})] TJ ET"
    val content2 =
      s"BT /F1 12 Tf 72 720 Td (Tail \\($docId\\) \\\\ \\101\\102 end) Tj " +
        "T* /F2 12 Tf (\\310\\311\\312\\313 \\322\\323\\324\\325 ) Tj <DC> Tj" +
        (if (cid)
          " T* /F3 12 Tf <0100010101020103 0020 020002010202 0020 0300> Tj"
        else "") + " ET"
    val cmap =
      """/CIDInit /ProcSet findresource begin
        |begincmap
        |1 begincodespacerange
        |<00> <FF>
        |endcodespacerange
        |1 beginbfrange
        |<D2> <D5> <0394>
        |endbfrange
        |1 beginbfchar
        |<DC> <2764>
        |endbfchar
        |endcmap
        |""".stripMargin
    val deflated1 = {
      val d = new java.util.zip.Deflater()
      d.setInput(content1.getBytes(utf8)); d.finish()
      val buf = new Array[Byte](1 << 16)
      val bos = new java.io.ByteArrayOutputStream()
      while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
      d.end()
      bos.toByteArray
    }
    val bos = new java.io.ByteArrayOutputStream()
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    def w(s: String): Unit = bos.write(s.getBytes(utf8))
    w("%PDF-1.4\n")
    def obj(num: Int)(body: => Unit): Unit = {
      offsets += bos.size()
      w(s"$num 0 obj\n"); body; w("endobj\n")
    }
    obj(1)(w("<< /Type /Catalog /Pages 2 0 R >>\n"))
    obj(2)(w("<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>\n"))
    obj(3)(w("<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\n"))
    obj(4) {
      w(s"<< /Length ${deflated1.length} /Filter /FlateDecode >>\nstream\n")
      bos.write(deflated1)
      w("\nendstream\n")
    }
    obj(5)(w("<< /Type /Page /Parent 2 0 R /Contents 6 0 R " +
      "/Resources << /Font << /F2 7 0 R" +
      (if (cid) " /F3 10 0 R" else "") + " >> >> >>\n"))
    obj(6) {
      val c2 = content2.getBytes(utf8)
      w(s"<< /Length ${c2.length} >>\nstream\n")
      bos.write(c2)
      w("\nendstream\n")
    }
    obj(7)(w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
      "/Encoding 8 0 R /ToUnicode 9 0 R >>\n"))
    obj(8)(w("<< /Type /Encoding " +
      "/Differences [200 /eacute /egrave /Euro /Lslash] >>\n"))
    obj(9) {
      val cm = cmap.getBytes(utf8)
      w(s"<< /Length ${cm.length} >>\nstream\n")
      bos.write(cm)
      w("\nendstream\n")
    }
    if (cid) {
      val cidCmap =
        """/CIDInit /ProcSet findresource begin
          |begincmap
          |1 begincodespacerange
          |<0000> <FFFF>
          |endcodespacerange
          |2 beginbfrange
          |<0100> <0103> <4E00>
          |<0200> <0202> [<65E5> <672C> <8A9E>]
          |endbfrange
          |2 beginbfchar
          |<0020> <0020>
          |<0300> <3042>
          |endbfchar
          |endcmap
          |""".stripMargin
      obj(10)(w("<< /Type /Font /Subtype /Type0 /BaseFont /GraftCJK " +
        "/Encoding /Identity-H /DescendantFonts [12 0 R] " +
        "/ToUnicode 11 0 R >>\n"))
      obj(11) {
        val cm = cidCmap.getBytes(utf8)
        w(s"<< /Length ${cm.length} >>\nstream\n")
        bos.write(cm)
        w("\nendstream\n")
      }
      obj(12)(w("<< /Type /Font /Subtype /CIDFontType2 " +
        "/BaseFont /GraftCJK >>\n"))
    }
    val xrefOff = bos.size()
    w(s"xref\n0 ${offsets.length + 1}\n")
    w("0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer << /Size ${offsets.length + 1} /Root 1 0 R >>\n")
    w(s"startxref\n$xrefOff\n%%EOF\n")
    bos.toByteArray
  }

  /** The PDF 1.5 twin of `buildPdf`: the SAME logical document, but the
    * catalog/pages/page dictionaries pack into a Flate OBJECT STREAM
    * and the cross-reference is a `/Type /XRef` STREAM (`/W [1 3 2]`
    * binary rows: type-1 direct offsets for the content streams, the
    * objstm, and the xref stream itself; type-2 rows for the packed
    * dicts) — the layout every modern PDF writer emits. Page 2's line
    * says `XRef` instead of `Tail` so the two corpora stay
    * distinguishable under their hashes.
    */
  private[graft] def buildPdf15(
      docId: Long, bodyA: String, bodyB1: String, bodyB2: String): Array[Byte] = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    def deflate(b: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(b); d.finish()
      val buf = new Array[Byte](1 << 16)
      val bos = new java.io.ByteArrayOutputStream()
      while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
      d.end()
      bos.toByteArray
    }
    val content1 =
      s"BT /F1 12 Tf 72 720 Td (Doc $docId) Tj T* (${escapePdfString(bodyA)}) Tj " +
        s"T* [(${escapePdfString(bodyB1)}) -250 (${escapePdfString(bodyB2)})] TJ ET"
    val content2 =
      s"BT /F1 12 Tf 72 720 Td (XRef \\($docId\\) \\\\ \\101\\102 end) Tj ET"
    val deflated1 = deflate(content1.getBytes(utf8))
    // object stream: catalog, pages, both page dicts
    val objBodies = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>",
      3 -> "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
      5 -> "<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>")
    var rel = 0
    val headerPairs = objBodies.map { case (n, b) =>
      val s = s"$n $rel"; rel += b.length + 1; s
    }.mkString(" ")
    val first = headerPairs.length + 1
    val stmRaw = (headerPairs + " " + objBodies.map(_._2).mkString(" "))
      .getBytes(utf8)
    val objStmData = deflate(stmRaw)

    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(utf8))
    val offsets = scala.collection.mutable.Map.empty[Int, Int]
    w("%PDF-1.5\n")
    offsets(4) = bos.size()
    w(s"4 0 obj\n<< /Length ${deflated1.length} /Filter /FlateDecode >>\nstream\n")
    bos.write(deflated1); w("\nendstream\nendobj\n")
    val c2 = content2.getBytes(utf8)
    offsets(6) = bos.size()
    w(s"6 0 obj\n<< /Length ${c2.length} >>\nstream\n")
    bos.write(c2); w("\nendstream\nendobj\n")
    offsets(7) = bos.size()
    w(s"7 0 obj\n<< /Type /ObjStm /N ${objBodies.length} /First $first " +
      s"/Filter /FlateDecode /Length ${objStmData.length} >>\nstream\n")
    bos.write(objStmData); w("\nendstream\nendobj\n")
    val xrefOff = bos.size()
    offsets(8) = xrefOff
    // xref rows for objects 0..8, W = [1 3 2]
    val rows = new java.io.ByteArrayOutputStream()
    def row(t: Int, f2: Int, f3: Int): Unit = {
      rows.write(t)
      rows.write((f2 >> 16) & 0xff); rows.write((f2 >> 8) & 0xff); rows.write(f2 & 0xff)
      rows.write((f3 >> 8) & 0xff); rows.write(f3 & 0xff)
    }
    row(0, 0, 65535)
    row(2, 7, 0); row(2, 7, 1); row(2, 7, 2) // objs 1..3 in objstm 7
    row(1, offsets(4), 0)
    row(2, 7, 3) // obj 5
    row(1, offsets(6), 0)
    row(1, offsets(7), 0)
    row(1, offsets(8), 0)
    // PNG Up-filter the rows (Predictor 12) — the layout real writers
    // emit; each 6-byte row is prefixed with filter type 2 and stored
    // as the delta against the previous row
    val plainRows = rows.toByteArray
    val cols = 6
    val filtered = new java.io.ByteArrayOutputStream()
    var r = 0
    while (r * cols < plainRows.length) {
      filtered.write(2)
      var x = 0
      while (x < cols) {
        val prev = if (r > 0) plainRows((r - 1) * cols + x) & 0xff else 0
        filtered.write(((plainRows(r * cols + x) & 0xff) - prev) & 0xff)
        x += 1
      }
      r += 1
    }
    val xrefData = deflate(filtered.toByteArray)
    w(s"8 0 obj\n<< /Type /XRef /Size 9 /W [1 3 2] /Root 1 0 R " +
      s"/DecodeParms << /Predictor 12 /Columns 6 >> " +
      s"/Filter /FlateDecode /Length ${xrefData.length} >>\nstream\n")
    bos.write(xrefData); w("\nendstream\nendobj\n")
    w(s"startxref\n$xrefOff\n%%EOF\n")
    bos.toByteArray
  }

  // ------------------------------------------------------------------ q136

  /** The deterministic body split shared by corpus and oracle: first
    * half of the words (ceil) via `Tj`, the rest via a `TJ` array cut
    * after 3 characters.
    */
  private[graft] def corpusParts(docs: DataFrame): DataFrame =
    docs
      .withColumn("ws", split(col("text"), " "))
      .withColumn("na", expr("CAST((size(ws) + 1) DIV 2 AS INT)"))
      .select(col("doc_id"),
        array_join(slice(col("ws"), lit(1), col("na")), " ").as("bodyA"),
        array_join(
          slice(col("ws"), col("na") + 1,
            greatest(size(col("ws")) - col("na"), lit(0))), " ").as("bodyB"))
      .select(col("doc_id"), col("bodyA"),
        substring(col("bodyB"), 1, 3).as("bodyB1"),
        expr("substr(bodyB, 4)").as("bodyB2"))

  /** q136: PDF text extraction end-to-end — build a real two-page PDF
    * per document (Flate + plain streams, xref table, escape classes),
    * run the REAL xref walk + inflate + BT/ET extraction, and emit
    * per-doc status/page/stream counts and the extracted-text sha,
    * all oracle-replayed from (doc_id, text).
    */
  def q136PdfExtract(spark: SparkSession, dir: String): DataFrame =
    pdfExtractQuery(spark, dir, buildPdf)

  /** q140: the identical contract over the PDF 1.5 corpus — xref
    * STREAM + object STREAM resolution end-to-end (the modern-writer
    * layout); the oracle replays the same word-split arithmetic with
    * the `XRef` page-2 line.
    */
  def q140PdfXrefStream(spark: SparkSession, dir: String): DataFrame =
    pdfExtractQuery(spark, dir, buildPdf15)

  /** q181: the q136 contract over the CID corpus — every document
    * additionally carries an Identity-H Type0 font whose 2-byte
    * `/ToUnicode` CMap (2-byte codespace, contiguous + ARRAY-form
    * bfrange, wide bfchars) decodes a planted CJK line shown as one
    * hex string; the line lands under the oracle's text sha, so any
    * width, pairing, array-form, or Identity-fallback slip changes
    * every hash.
    */
  def q181PdfCidExtract(spark: SparkSession, dir: String): DataFrame =
    pdfExtractQuery(spark, dir, buildPdfCid)

  private def pdfExtractQuery(
      spark: SparkSession, dir: String,
      build: (Long, String, String, String) => Array[Byte]): DataFrame = {
    import spark.implicits._
    val parts = corpusParts(Tables.documents(spark, dir))
    val out = parts
      .select(col("doc_id"), col("bodyA"), col("bodyB1"), col("bodyB2"))
      .as[(Long, String, String, String)]
      .mapPartitions(_.map { case (id, a, b1, b2) =>
        extractPdf(id, build(id, a, b1, b2))
      })
      .toDF()
    out.select(col("doc_id"), col("status"),
      col("n_pages").cast("long").as("n_pages"),
      col("n_streams").cast("long").as("n_streams"),
      sha2(col("text"), 256).as("text_sha"))
      .orderBy(col("doc_id"))
  }
}
