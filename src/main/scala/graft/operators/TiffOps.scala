package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TIFF (baseline, 6.0) container walk — the scanned-document image
  * format a document-heavy crawl carries beside PNG/JPEG/GIF/WebP, and
  * the ONLY one of them that is byte-order-polymorphic: the header
  * declares `II` (little-endian) or `MM` (big-endian) and EVERY
  * integer in the file — IFD offsets, tag counts, inline values —
  * follows it. The corpus alternates endianness by doc_id so both
  * decoders sit under one oracle hash; getting the inline-SHORT
  * convention wrong in exactly one endianness is the classic TIFF bug
  * this pins.
  *
  * The walk (public TIFF 6.0 spec): header magic 42 + first-IFD
  * offset; each IFD is an entry count + 12-byte entries (tag, type,
  * count, value-or-offset — a value ≤ 4 bytes is stored INLINE
  * left-justified in byte order) + a next-IFD offset chaining
  * multi-page files (the corpus gives `id % 3 == 0` documents a
  * second page). Baseline tags read: ImageWidth(256),
  * ImageLength(257), BitsPerSample(258), Compression(259, must be 1),
  * StripOffsets(273), StripByteCounts(279), DateTime(306, ASCII at
  * offset). Pixel data: one gray-8 strip per page, summed — the
  * deterministic payload check the oracle replays as grid arithmetic.
  *
  * Error-as-value: bad magic / a truncated IFD or strip / an IFD
  * cycle (page cap) / unsupported compression dead-letter the file
  * with pages already parsed kept.
  *
  * Scale shape (100 TB): per-row byte walker via `mapPartitions`,
  * zero shuffle before the output sort.
  */
object TiffOps {

  private val MaxPages = 16

  final case class TiffInfo(
      doc_id: Long, status: String, endian: String, n_pages: Int,
      width: Int, height: Int, bits: Int, pixel_sum: Long, datetime: String)

  // --------------------------------------------------------------- encode

  private[graft] def widthOf(id: Long): Int = 8 + (id % 5).toInt
  private[graft] def heightOf(id: Long): Int = 4 + (id % 3).toInt
  private[graft] def pixel(id: Long, x: Int, y: Int): Int =
    ((x + y + id) % 251).toInt

  private final class W(le: Boolean) {
    val bos = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit =
      if (le) { bos.write(v & 0xff); bos.write((v >>> 8) & 0xff) }
      else { bos.write((v >>> 8) & 0xff); bos.write(v & 0xff) }
    def u32(v: Long): Unit =
      if (le) { var i = 0; while (i < 4) { bos.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 } }
      else { var i = 3; while (i >= 0) { bos.write(((v >>> (8 * i)) & 0xff).toInt); i -= 1 } }
    /** A 12-byte entry with an inline SHORT value (left-justified). */
    def entryShort(tag: Int, v: Int): Unit = {
      u16(tag); u16(3); u32(1L); u16(v); u16(0)
    }
    def entryLong(tag: Int, v: Long): Unit = { u16(tag); u16(4); u32(1L); u32(v) }
    def entryAscii(tag: Int, len: Int, off: Long): Unit = {
      u16(tag); u16(2); u32(len.toLong); u32(off)
    }
  }

  /** A real 1–2 page gray-8 TIFF per document; `II` for even ids, `MM`
    * for odd; page 2 (on `id % 3 == 0`) is a fixed 4×4.
    */
  private[graft] def buildTiff(id: Long): Array[Byte] = {
    val le = id % 2 == 0
    val w = new W(le)
    val pages: Seq[(Int, Int)] =
      (widthOf(id), heightOf(id)) +: (if (id % 3 == 0) Seq((4, 4)) else Nil)
    val dt = f"2026:${id % 12 + 1}%02d:${id % 28 + 1}%02d ${id % 24}%02d:00:00"
    val dtBytes = dt.getBytes(java.nio.charset.StandardCharsets.US_ASCII) :+ 0.toByte
    // layout: header(8) | per page: strip, dt copy, IFD
    w.bos.write(if (le) 'I' else 'M'); w.bos.write(if (le) 'I' else 'M')
    w.u16(42)
    // compute offsets: strips and dt first, IFDs after
    var off = 8L
    val stripOffs = pages.map { case (pw, ph) => val o = off; off += pw * ph; o }
    val dtOff = off
    off += dtBytes.length
    val ifdSize = 2 + 8 * 12 + 4
    val ifdOffs = pages.indices.map(i => off + i * ifdSize)
    w.u32(ifdOffs.head)
    pages.zipWithIndex.foreach { case ((pw, ph), _) =>
      for (y <- 0 until ph; x <- 0 until pw) w.bos.write(pixel(id, x, y))
    }
    w.bos.write(dtBytes)
    pages.zipWithIndex.foreach { case ((pw, ph), i) =>
      w.u16(8) // entry count
      w.entryShort(256, pw)
      w.entryShort(257, ph)
      w.entryShort(258, 8)
      w.entryShort(259, 1) // no compression
      w.entryLong(273, stripOffs(i))
      w.entryShort(277, 1)
      w.entryLong(279, (pw * ph).toLong)
      w.entryAscii(306, dtBytes.length, dtOff)
      w.u32(if (i + 1 < pages.length) ifdOffs(i + 1) else 0L)
    }
    w.bos.toByteArray
  }

  // ----------------------------------------------------------------- walk

  private[graft] def parseTiff(docId: Long, b: Array[Byte]): TiffInfo = {
    def dead(status: String) = TiffInfo(docId, status, "", 0, 0, 0, 0, 0L, "")
    if (b.length < 8) return dead("not-tiff")
    val le =
      if (b(0) == 'I' && b(1) == 'I') true
      else if (b(0) == 'M' && b(1) == 'M') false
      else return dead("not-tiff")
    def u16(off: Int): Int =
      if (le) (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
      else ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
    def u32(off: Int): Long = {
      var v = 0L
      var i = 0
      while (i < 4) {
        val sh = if (le) 8 * i else 8 * (3 - i)
        v |= (b(off + i) & 0xffL) << sh
        i += 1
      }
      v
    }
    if (u16(2) != 42) return dead("not-tiff")
    val endian = if (le) "II" else "MM"
    var ifd = u32(4)
    val seen = scala.collection.mutable.Set.empty[Long]
    var pages = 0
    var w0 = 0; var h0 = 0; var bits0 = 0
    var sum = 0L
    var dt = ""
    while (ifd != 0) {
      if (!seen.add(ifd) || pages >= MaxPages)
        return dead("ifd-cycle")
      if (ifd < 0 || ifd + 2 > b.length) return dead("truncated")
      val n = u16(ifd.toInt)
      val base = ifd.toInt + 2
      if (base + 12 * n + 4 > b.length) return dead("truncated")
      var width = 0; var height = 0; var bits = 0; var comp = 1
      var stripOff = -1L; var stripLen = -1L
      var i = 0
      while (i < n) {
        val e = base + 12 * i
        val tag = u16(e)
        val typ = u16(e + 2)
        val cnt = u32(e + 4)
        // inline SHORT values are left-justified in byte order
        def shortVal: Int = u16(e + 8)
        def longVal: Long = u32(e + 8)
        tag match {
          case 256 => width = if (typ == 3) shortVal else longVal.toInt
          case 257 => height = if (typ == 3) shortVal else longVal.toInt
          case 258 => bits = shortVal
          case 259 => comp = shortVal
          case 273 => stripOff = if (typ == 3) shortVal.toLong else longVal
          case 279 => stripLen = if (typ == 3) shortVal.toLong else longVal
          case 306 if typ == 2 =>
            val o = longVal
            if (cnt > 0 && o >= 0 && o + cnt <= b.length)
              dt = new String(b, o.toInt, cnt.toInt - 1,
                java.nio.charset.StandardCharsets.US_ASCII)
          case _ => ()
        }
        i += 1
      }
      if (comp != 1) return dead("unsupported-compression")
      if (width <= 0 || height <= 0 || stripOff < 0 || stripLen != width.toLong * height)
        return dead("bad-ifd")
      if (stripOff + stripLen > b.length) return dead("truncated")
      var p = stripOff.toInt
      val end = (stripOff + stripLen).toInt
      while (p < end) { sum += (b(p) & 0xff); p += 1 }
      if (pages == 0) { w0 = width; h0 = height; bits0 = bits }
      pages += 1
      ifd = u32(base + 12 * n)
    }
    if (pages == 0) return dead("no-pages")
    TiffInfo(docId, "ok", endian, pages, w0, h0, bits0, sum, dt)
  }

  // ----------------------------------------------------------------- q162

  /** q162: the TIFF walk end to end — both byte orders under one hash,
    * multi-page IFD chains, inline-SHORT convention, strip sums and
    * the DateTime string replayed from doc_id arithmetic.
    */
  def q162TiffScan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => parseTiff(id, buildTiff(id))))
      .toDF()
      .select(col("doc_id"), col("status"), col("endian"),
        col("n_pages").cast("long").as("n_pages"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("bits").cast("long").as("bits"),
        col("pixel_sum"), col("datetime"))
      .orderBy(col("doc_id"))
  }
}
