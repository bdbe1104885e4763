package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** XLSX (SpreadsheetML) extraction — the third OOXML/zip document
  * class beside DOCX (q143) and EPUB (q144): spreadsheets are a common
  * crawl document type and their text lives behind TWO indirections a
  * naive walk misses — the shared-strings table (cell `<v>` holds an
  * INDEX into `xl/sharedStrings.xml`, where rich-text runs split one
  * string across `<r><t>` segments) and the styles table (a date is a
  * NUMBER whose cell style points at a date number format; the serial
  * is days since 1899-12-30). The walk:
  *
  *   - zip central directory → `xl/workbook.xml` (sheet order + r:id)
  *     → `xl/_rels/workbook.xml.rels` (r:id → worksheet part), the
  *     real two-hop part resolution;
  *   - `xl/sharedStrings.xml`: `<si>` entries, each the CONCAT of its
  *     `<t>` runs (plain and rich-text forms);
  *   - `xl/styles.xml`: `<cellXfs>` order → numFmtId per style index;
  *     ids 14–22 and 45–47 are the spec's built-in date/time formats;
  *   - per sheet, rows by `r`, cells by column letters from the cell
  *     ref; cell types: `t="s"` shared string, `t="inlineStr"`
  *     (`<is><t>`), `t="b"` boolean, `t="str"` literal, default
  *     number — rendered as the raw `<v>` text unless the style says
  *     date (serial → ISO).
  *
  * Error-as-value (the q143 discipline): typed dead-letters for a
  * non-zip, a missing workbook/sheet part, or a malformed entry; a
  * decoy `docProps/core.xml` and the styles part must never leak text.
  *
  * Scale shape (100 TB): per-row container walk via `mapPartitions`,
  * zero shuffle before the output sort.
  */
object XlsxOps {

  final case class XlsxInfo(
      doc_id: Long, status: String, n_entries: Int, n_sheets: Int,
      n_rows: Int, n_cells: Int, n_shared: Int, text: String)

  private val DateFmtIds: Set[Int] = ((14 to 22) ++ (45 to 47)).toSet

  // --------------------------------------------------------------- encode

  private[graft] def rowsOf(id: Long): Int = (3 + id % 5).toInt

  /** A real seven-part XLSX per document (workbook + rels + styles +
    * shared strings + two worksheets + content types + a decoy
    * `docProps/core.xml` whose text must never leak): the Data sheet
    * plants shared strings (one per row + a RICH-TEXT "Common" entry
    * reused across rows), raw numbers, inline strings with escapes
    * (absent every third row — a column gap the walk must not pad),
    * date serials behind style 1, and booleans; the Meta sheet proves
    * the workbook-ordered multi-sheet walk. Entry compression
    * alternates by id (the q143 method-independence trick).
    */
  private[graft] def buildXlsx(id: Long): Array[Byte] = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val n = rowsOf(id)
    // shared strings in first-use order: Item per row, then Common, Doc
    val items = (0 until n).map(j => s"Item $id-$j")
    val common = s"Common ${id % 7}"
    val sstList = (items.take(1) :+ common) ++ items.drop(1) :+ "Doc"
    val sstIndex = sstList.zipWithIndex.toMap
    val sstXml = new StringBuilder(
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
        "<sst xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\" " +
        s"count=\"${sstList.size}\" uniqueCount=\"${sstList.size}\">")
    sstList.foreach { s =>
      if (s == common) {
        // rich-text form: two runs the extractor must concatenate
        val cut = s.length - 2
        sstXml.append("<si><r><t xml:space=\"preserve\">")
          .append(ZipOps.xmlEscape(s.substring(0, cut)))
          .append("</t></r><r><t>")
          .append(ZipOps.xmlEscape(s.substring(cut)))
          .append("</t></r></si>")
      } else sstXml.append("<si><t xml:space=\"preserve\">")
        .append(ZipOps.xmlEscape(s)).append("</t></si>")
    }
    sstXml.append("</sst>")
    def cell(ref: String, t: String, body: String, style: Int = -1): String = {
      val ts = if (t.isEmpty) "" else s" t=\"$t\""
      val ss = if (style < 0) "" else s" s=\"$style\""
      s"<c r=\"$ref\"$ts$ss>$body</c>"
    }
    val dataRows = (0 until n).map { j =>
      val r = j + 1
      val cells = new StringBuilder
      cells.append(cell(s"A$r", "s", s"<v>${sstIndex(items(j))}</v>"))
      cells.append(cell(s"B$r", "", s"<v>${(id * 31 + j * 7) % 1000}</v>"))
      if (j % 3 != 0)
        cells.append(cell(s"C$r", "inlineStr",
          "<is><t xml:space=\"preserve\">" +
            ZipOps.xmlEscape(s"inline &$j") + "</t></is>"))
      cells.append(cell(s"D$r", "", s"<v>${40000 + (id + j) % 2000}</v>", 1))
      cells.append(cell(s"E$r", "b", s"<v>${(id + j) % 2}</v>"))
      cells.append(cell(s"F$r", "s", s"<v>${sstIndex(common)}</v>"))
      s"<row r=\"$r\">$cells</row>"
    }.mkString
    val sheet1 =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
        "<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\">" +
        "<sheetData>" + dataRows + "</sheetData></worksheet>"
    val sheet2 =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
        "<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\">" +
        "<sheetData><row r=\"1\">" +
        cell("A1", "s", s"<v>${sstIndex("Doc")}</v>") +
        cell("B1", "", s"<v>$id</v>") +
        "</row></sheetData></worksheet>"
    val workbook =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
        "<workbook xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\" " +
        "xmlns:r=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships\">" +
        // every fifth workbook is Mac-origin: the 1904 date system
        (if (id % 5 == 0) "<workbookPr date1904=\"1\"/>" else "") +
        "<sheets><sheet name=\"Data\" sheetId=\"1\" r:id=\"rId2\"/>" +
        "<sheet name=\"Meta\" sheetId=\"2\" r:id=\"rId1\"/></sheets></workbook>"
    // rIds deliberately out of numeric order: the walk must resolve
    // through the rels part, not assume sheetN.xml naming
    val rels =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
        "<Relationships xmlns=\"http://schemas.openxmlformats.org/package/2006/relationships\">" +
        "<Relationship Id=\"rId2\" Type=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet\" Target=\"worksheets/sheet1.xml\"/>" +
        "<Relationship Id=\"rId1\" Type=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet\" Target=\"worksheets/sheet2.xml\"/>" +
        "<Relationship Id=\"rId3\" Type=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles\" Target=\"styles.xml\"/>" +
        "</Relationships>"
    val styles =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
        "<styleSheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\">" +
        "<cellXfs count=\"2\"><xf numFmtId=\"0\" fontId=\"0\"/>" +
        "<xf numFmtId=\"14\" fontId=\"0\" applyNumberFormat=\"1\"/></cellXfs>" +
        "</styleSheet>"
    val ct =
      "<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
        "<Types xmlns=\"http://schemas.openxmlformats.org/package/2006/content-types\">" +
        "<Default Extension=\"xml\" ContentType=\"application/xml\"/></Types>"
    val decoy =
      "<?xml version=\"1.0\"?><cp:coreProperties xmlns:cp=\"x\">" +
        "<dc:title xmlns:dc=\"y\">DECOY title " + id + "</dc:title></cp:coreProperties>"
    val defl = id % 2 == 0
    ZipOps.buildZip(Seq(
      ("[Content_Types].xml", ct.getBytes(utf8), false),
      ("docProps/core.xml", decoy.getBytes(utf8), true),
      ("xl/workbook.xml", workbook.getBytes(utf8), defl),
      ("xl/_rels/workbook.xml.rels", rels.getBytes(utf8), defl),
      ("xl/styles.xml", styles.getBytes(utf8), !defl),
      ("xl/sharedStrings.xml", sstXml.toString.getBytes(utf8), defl),
      ("xl/worksheets/sheet1.xml", sheet1.getBytes(utf8), defl),
      ("xl/worksheets/sheet2.xml", sheet2.getBytes(utf8), !defl)))
  }

  // ---------------------------------------------------------------- walk

  private val SheetRe =
    """<sheet\b[^>]*?name="([^"]*)"[^>]*?r:id="([^"]*)"""".r
  private val RelRe =
    """<Relationship\b[^>]*?Id="([^"]*)"[^>]*?Target="([^"]*)"""".r
  private val SiRe = """(?s)<si>(.*?)</si>""".r
  private val TRe = """(?s)<t(?:\s[^>]*)?>(.*?)</t>""".r
  // match EVERY <xf> element (numFmtId may be absent — defaults to 0);
  // matching only numFmtId-bearing ones would shift all later style
  // indices when a real-world styles.xml omits the attribute
  private val XfRe = """<xf\b([^>]*?)/?>""".r
  // attrs captured whole and r= pulled out by attr(): an optional
  // inline group after a lazy prefix never captures (the greedy tail
  // eats it without backtracking once the shortest match succeeds)
  private val RowRe = """(?s)<row\b([^>]*)>(.*?)</row>""".r
  private val CellRe = """(?s)<c\b([^>]*?)(?:/>|>(.*?)</c>)""".r
  private val VRe = """(?s)<v(?:\s[^>]*)?>(.*?)</v>""".r
  private def attr(attrs: String, name: String): Option[String] = {
    // (^|\s) boundary: without it an attribute NAME ending in the
    // searched name (e.g. customFmtId vs FmtId) would mis-capture
    val m = ("(?:^|\\s)" + name + "=\"([^\"]*)\"").r.findFirstMatchIn(attrs)
    m.map(_.group(1))
  }

  /** Column letters of a cell ref ("BC7" → 54) for in-row ordering. */
  private def colOf(ref: String): Int = {
    var v = 0
    var i = 0
    while (i < ref.length && ref.charAt(i) >= 'A' && ref.charAt(i) <= 'Z') {
      v = v * 26 + (ref.charAt(i) - 'A' + 1)
      i += 1
    }
    v - 1
  }

  /** Excel date serial → ISO. The 1900 system counts from 1899-12-30
    * (the Lotus leap-bug offset folded in for post-1901 dates); the
    * 1904 system (Mac-origin workbooks, `workbookPr date1904`) counts
    * from 1904-01-01 with no bug.
    */
  private def serialToIso(serial: Long, date1904: Boolean): String =
    (if (date1904) java.time.LocalDate.of(1904, 1, 1)
     else java.time.LocalDate.of(1899, 12, 30)).plusDays(serial).toString

  private val Date1904Re =
    "<workbookPr\\b[^>]*\\bdate1904=\"(1|true)\"".r

  private[graft] def extractXlsx(docId: Long, b: Array[Byte]): XlsxInfo = {
    def dead(status: String) = XlsxInfo(docId, status, 0, 0, 0, 0, 0, "")
    val entries = ZipOps.centralDirectory(b) match {
      case None => return dead("not-zip")
      case Some(e) => e
    }
    def part(name: String): Option[String] =
      entries.find(_.name == name)
        .flatMap(e => ZipOps.entryBytes(b, e))
        .map(new String(_, java.nio.charset.StandardCharsets.UTF_8))
    val workbook = part("xl/workbook.xml") match {
      case None => return dead("no-workbook")
      case Some(x) => x
    }
    val rels = part("xl/_rels/workbook.xml.rels").getOrElse("")
    val relMap = RelRe.findAllMatchIn(rels)
      .map(m => m.group(1) -> m.group(2)).toMap
    val shared = part("xl/sharedStrings.xml").map { sst =>
      SiRe.findAllMatchIn(sst).map(si =>
        TRe.findAllMatchIn(si.group(1)).map(t =>
          ZipOps.xmlUnescape(t.group(1))).mkString).toVector
    }.getOrElse(Vector.empty)
    val dateStyles: Set[Int] = part("xl/styles.xml").map { st =>
      val xfs = st.indexOf("<cellXfs")
      val end = st.indexOf("</cellXfs>")
      if (xfs < 0 || end < 0) Set.empty[Int]
      else XfRe.findAllMatchIn(st.substring(xfs, end)).zipWithIndex.collect {
        case (m, i) if DateFmtIds.contains(
          attr(m.group(1), "numFmtId").flatMap(_.toIntOption).getOrElse(0)) =>
          i
      }.toSet
    }.getOrElse(Set.empty)
    val date1904 = Date1904Re.findFirstIn(workbook).isDefined
    val sheets = SheetRe.findAllMatchIn(workbook)
      .map(m => (m.group(1), m.group(2))).toSeq
    if (sheets.isEmpty) return dead("no-sheets")
    var nRows = 0
    var nCells = 0
    var bad: String = null
    val out = new StringBuilder
    var si = 0
    while (si < sheets.length && bad == null) {
      val rid = sheets(si)._2
      relMap.get(rid).map(t => part("xl/" + t)) match {
        case None => bad = "missing-rel"
        case Some(None) => bad = "missing-sheet"
        case Some(Some(xml)) =>
          val rows = RowRe.findAllMatchIn(xml).toSeq
            .zipWithIndex
            .map { case (m, i) =>
              (attr(m.group(1), "r").flatMap(_.toLongOption)
                .getOrElse(i.toLong + 1), m.group(2))
            }
            .sortBy(_._1)
          for ((_, body) <- rows) {
            val cells = CellRe.findAllMatchIn(body).toSeq.flatMap { cm =>
              val attrs = cm.group(1)
              val cellBody = Option(cm.group(2)).getOrElse("")
              val ref = attr(attrs, "r").getOrElse("")
              val t = attr(attrs, "t").getOrElse("")
              val style = attr(attrs, "s").map(_.toInt).getOrElse(-1)
              val text: Option[String] = t match {
                case "s" =>
                  val idx = VRe.findFirstMatchIn(cellBody)
                    .flatMap(_.group(1).trim.toIntOption).getOrElse(-1)
                  if (idx >= 0 && idx < shared.size) Some(shared(idx))
                  else { bad = "bad-shared-index"; None }
                case "inlineStr" =>
                  Some(TRe.findAllMatchIn(cellBody).map(m =>
                    ZipOps.xmlUnescape(m.group(1))).mkString)
                case "b" =>
                  VRe.findFirstMatchIn(cellBody).map(v =>
                    if (v.group(1).trim == "0") "FALSE" else "TRUE")
                case "str" =>
                  VRe.findFirstMatchIn(cellBody).map(v =>
                    ZipOps.xmlUnescape(v.group(1)))
                case _ => // number; a date style renders the serial as ISO
                  VRe.findFirstMatchIn(cellBody).map { v =>
                    val raw = v.group(1).trim
                    if (dateStyles.contains(style))
                      raw.toLongOption.map(serialToIso(_, date1904))
                        .getOrElse(raw)
                    else raw
                  }
              }
              text.map(tx => (if (ref.nonEmpty) colOf(ref) else Int.MaxValue, tx))
            }
            if (cells.nonEmpty) {
              if (out.nonEmpty) out.append('\n')
              out.append(cells.sortBy(_._1).map(_._2).mkString("\t"))
              nRows += 1
              nCells += cells.length
            }
          }
      }
      si += 1
    }
    if (bad != null) return dead(bad)
    XlsxInfo(docId, "ok", entries.length, sheets.length, nRows, nCells,
      shared.size, out.toString)
  }

  // ---------------------------------------------------------------- q188

  /** q188: the spreadsheet front door end to end — build a real
    * seven-part XLSX per document, resolve sheets through the rels
    * part (rIds planted out of order), join shared strings (incl. a
    * rich-text entry), render numbers raw, date serials as ISO via the
    * styles table, booleans as TRUE/FALSE, skip the planted column
    * gaps — row count, cell count, shared-string count, and the
    * tab/newline-joined text sha all replayed by the oracle from pure
    * doc_id arithmetic.
    */
  def q188XlsxExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => extractXlsx(id, buildXlsx(id))))
      .toDF()
      .select(col("doc_id"), col("status"),
        col("n_entries").cast("long").as("n_entries"),
        col("n_sheets").cast("long").as("n_sheets"),
        col("n_rows").cast("long").as("n_rows"),
        col("n_cells").cast("long").as("n_cells"),
        col("n_shared").cast("long").as("n_shared"),
        sha2(col("text"), 256).as("text_sha"))
      .orderBy(col("doc_id"))
  }
}
