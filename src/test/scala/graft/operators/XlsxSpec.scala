package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** XLSX extraction: the two indirections (shared strings incl.
  * rich-text runs, date styles), rels-resolved sheet order, column
  * gaps, typed dead-letters, and the q188 oracle shape.
  */
class XlsxSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("a built workbook extracts exactly: shared strings joined (rich " +
    "text concatenated), dates ISO via styles, booleans, gaps skipped, " +
    "sheets in workbook order") {
    val info = XlsxOps.extractXlsx(10L, XlsxOps.buildXlsx(10L))
    assert(info.status == "ok")
    assert(info.n_entries == 8 && info.n_sheets == 2)
    val n = XlsxOps.rowsOf(10L) // 3
    assert(info.n_rows == n + 1)
    assert(info.n_shared == n + 2)
    val lines = info.text.split('\n')
    assert(lines.length == n + 1)
    // id 10 is a Mac-origin workbook (10 % 5 == 0): the 1904 date system
    def d1904(serial: Long) =
      java.time.LocalDate.of(1904, 1, 1).plusDays(serial).toString
    // row 0: gap at C (j % 3 == 0) → 5 cells
    assert(lines(0) == s"Item 10-0\t310\t${d1904(40010)}\tFALSE\tCommon 3",
      lines(0))
    // row 1: all 6 columns, rich-text Common concatenated, boolean flips
    assert(lines(1) ==
      s"Item 10-1\t317\tinline &1\t${d1904(40011)}\tTRUE\tCommon 3",
      lines(1))
    // a 1900-system sibling (id 11) keeps the Lotus-offset epoch
    val info11 = XlsxOps.extractXlsx(11L, XlsxOps.buildXlsx(11L))
    assert(info11.text.contains(
      java.time.LocalDate.of(1899, 12, 30).plusDays(40011).toString))
    // the Meta sheet rides LAST (workbook order, resolved through rels
    // despite rId1 pointing at sheet2)
    assert(lines.last == "Doc\t10", lines.last)
    // the decoy docProps/core.xml text never leaks
    assert(!info.text.contains("DECOY"))
  }

  test("typed dead-letters: not-zip, missing workbook, lying shared index") {
    assert(XlsxOps.extractXlsx(1L, Array[Byte](1, 2, 3)).status == "not-zip")
    val noWb = ZipOps.buildZip(Seq(
      ("[Content_Types].xml", "<Types/>".getBytes("UTF-8"), false)))
    assert(XlsxOps.extractXlsx(1L, noWb).status == "no-workbook")
    // corrupt a shared-string INDEX: the asset dead-letters typed
    val good = XlsxOps.buildXlsx(11L) // odd id: sheet1 stored (editable)
    val s = new String(good, java.nio.charset.StandardCharsets.ISO_8859_1)
    val at = s.indexOf("<c r=\"A1\" t=\"s\"><v>")
    assert(at > 0, "stored sheet xml must be visible")
    val bad = good.clone()
    // overwrite the index digit with '9' (out of sst range) — same
    // byte count, but the zip CRC now fails → typed bad-entry… so
    // instead drop sharedStrings by renaming it in both directories
    val renamed = {
      val t = new String(good, java.nio.charset.StandardCharsets.ISO_8859_1)
        .replace("xl/sharedStrings.xml", "xl/sharedStringz.xml")
      t.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    }
    assert(XlsxOps.extractXlsx(11L, renamed).status == "bad-shared-index")
    val _ = (bad, at)
  }

  test("rows planted OUT of document order sort by their r attribute " +
    "(the spec does not require storage order)") {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    def inline(ref: String, t: String) =
      s"""<c r="$ref" t="inlineStr"><is><t>$t</t></is></c>"""
    val sheet =
      "<?xml version=\"1.0\"?><worksheet><sheetData>" +
        s"""<row r="3">${inline("A3", "third")}</row>""" +
        s"""<row r="1">${inline("A1", "first")}</row>""" +
        s"""<row r="2">${inline("A2", "second")}</row>""" +
        "</sheetData></worksheet>"
    val workbook =
      "<?xml version=\"1.0\"?><workbook xmlns:r=\"x\"><sheets>" +
        "<sheet name=\"S\" sheetId=\"1\" r:id=\"rId1\"/></sheets></workbook>"
    val rels =
      "<?xml version=\"1.0\"?><Relationships>" +
        "<Relationship Id=\"rId1\" Type=\"t\" Target=\"worksheets/sheet1.xml\"/>" +
        "</Relationships>"
    val pkg = ZipOps.buildZip(Seq(
      ("[Content_Types].xml", "<Types/>".getBytes(utf8), false),
      ("xl/workbook.xml", workbook.getBytes(utf8), false),
      ("xl/_rels/workbook.xml.rels", rels.getBytes(utf8), false),
      ("xl/worksheets/sheet1.xml", sheet.getBytes(utf8), true)))
    val info = XlsxOps.extractXlsx(1L, pkg)
    assert(info.status == "ok")
    assert(info.text == "first\nsecond\nthird", info.text)
  }

  test("q188 on sf0.001: every doc extracts ok with arithmetic-exact counts") {
    val rows = XlsxOps.q188XlsxExtract(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val n = 3 + id % 5
      assert(r.getString(1) == "ok")
      assert(r.getLong(2) == 8L && r.getLong(3) == 2L)
      assert(r.getLong(4) == n + 1)
      assert(r.getLong(6) == n + 2)
    }
  }
}
