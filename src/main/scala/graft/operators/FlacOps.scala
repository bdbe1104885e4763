package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FLAC container scan — the third audio container beside WAV (q50/52)
  * and MP3 (q153): podcast/archive audio increasingly ships lossless,
  * and the metadata a pipeline needs (rate, channels, depth, exact
  * total samples → duration, tags) all lives in the metadata blocks
  * BEFORE any frame, so a scan never touches compressed audio. Frames
  * stay opaque (no LPC decode claimed — the Mp4Ops boundary).
  *
  * The walk (public FLAC format spec): `fLaC` magic, then metadata
  * blocks — 1-byte header (bit 7 = last-block flag, bits 0–6 = type)
  * + 24-bit big-endian length:
  *   - STREAMINFO (type 0, always first, 34 bytes): min/max block
  *     size, min/max frame size, then a 64-bit packed region — sample
  *     rate (20 bits), channels−1 (3), bits-per-sample−1 (5), total
  *     samples (36) — read by shift/mask off an 8-byte big-endian
  *     load;
  *   - VORBIS_COMMENT (type 4): LITTLE-endian u32 vendor length +
  *     vendor, u32 comment count, then per comment u32 length +
  *     `KEY=value` UTF-8 (keys case-insensitive; TITLE/ARTIST kept) —
  *     the one little-endian island in a big-endian format, a classic
  *     implementation trap the spec pins;
  *   - other block types (PADDING, SEEKTABLE, …) skip by length.
  *
  * Error-as-value: a missing/misplaced STREAMINFO, a block running
  * past EOF, or a comment length lying past its block dead-letters
  * the file with everything already parsed kept; allocation is capped
  * before trusting lengths.
  *
  * The q161 corpus builds a real four-block file per document (
  * STREAMINFO + PADDING decoy + VORBIS_COMMENT + a fake last AUDIO
  * placeholder) from doc_id arithmetic; the oracle replays rate,
  * channels, depth, exact sample count, floor-division duration, and
  * both tags.
  *
  * Scale shape (100 TB): per-row byte walker via `mapPartitions`,
  * zero shuffle before the output sort.
  */
object FlacOps {

  private val MaxBlockBytes = 1 << 24 // the 24-bit length's own bound

  final case class FlacInfo(
      doc_id: Long, status: String, sample_rate: Int, channels: Int,
      bits: Int, total_samples: Long, duration_ms: Long, title: String,
      artist: String, n_blocks: Int)

  // --------------------------------------------------------------- encode

  private def be24(v: Int): Array[Byte] =
    Array(((v >>> 16) & 0xff).toByte, ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def le32(v: Long): Array[Byte] =
    Array.tabulate[Byte](4)(i => ((v >>> (8 * i)) & 0xff).toByte)

  private[graft] def rateOf(id: Long): Int =
    Array(44100, 48000, 96000)((id % 3).toInt)
  private[graft] def channelsOf(id: Long): Int = 1 + (id % 2).toInt
  private[graft] def bitsOf(id: Long): Int = if (id % 4 == 0) 24 else 16
  private[graft] def samplesOf(id: Long): Long = 100000L + id * 37L

  /** A real four-block FLAC header per document (frames omitted — the
    * scan never reads them anyway).
    */
  private[graft] def buildFlac(id: Long): Array[Byte] = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("fLaC".getBytes(utf8))
    // STREAMINFO: type 0, 34 bytes
    val si = new Array[Byte](34)
    si(0) = 0x10; si(1) = 0x00 // min block 4096
    si(2) = 0x10; si(3) = 0x00 // max block 4096
    val packed = (rateOf(id).toLong << 44) |
      ((channelsOf(id) - 1).toLong << 41) |
      ((bitsOf(id) - 1).toLong << 36) |
      (samplesOf(id) & ((1L << 36) - 1))
    var i = 0
    while (i < 8) { si(10 + i) = ((packed >>> (8 * (7 - i))) & 0xff).toByte; i += 1 }
    bos.write(0x00); bos.write(be24(34)); bos.write(si)
    // PADDING decoy (type 1)
    bos.write(0x01); bos.write(be24(16)); bos.write(new Array[Byte](16))
    // VORBIS_COMMENT (type 4) — the little-endian island
    val vendor = "graft".getBytes(utf8)
    val comments = Seq(
      "TITLE=Track № " + id, // multi-byte: the length is OCTETS
      "artist=Artist " + (id % 20), // lower-case key: case-insensitive
      "ALBUM=decoy " + id)
    val vc = new java.io.ByteArrayOutputStream()
    vc.write(le32(vendor.length.toLong)); vc.write(vendor)
    vc.write(le32(comments.length.toLong))
    comments.foreach { c =>
      val b = c.getBytes(utf8)
      vc.write(le32(b.length.toLong)); vc.write(b)
    }
    val vcb = vc.toByteArray
    // last-block flag on the final metadata block
    bos.write(0x80 | 0x04); bos.write(be24(vcb.length)); bos.write(vcb)
    // opaque pseudo-frame bytes the scan must never read
    bos.write(Array.tabulate[Byte](32)(i => ((id + i) & 0xff).toByte))
    bos.toByteArray
  }

  // ----------------------------------------------------------------- walk

  private def be(b: Array[Byte], off: Int, n: Int): Long = {
    var v = 0L
    var i = 0
    while (i < n) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    v
  }
  private def le(b: Array[Byte], off: Int, n: Int): Long = {
    var v = 0L
    var i = 0
    while (i < n) { v |= (b(off + i) & 0xffL) << (8 * i); i += 1 }
    v
  }

  private[graft] def parseFlac(docId: Long, b: Array[Byte]): FlacInfo = {
    def dead(status: String) =
      FlacInfo(docId, status, 0, 0, 0, 0L, 0L, "", "", 0)
    if (b.length < 8 || b(0) != 'f' || b(1) != 'L' || b(2) != 'a' || b(3) != 'C')
      return dead("not-flac")
    var p = 4
    var last = false
    var first = true
    var rate = 0; var ch = 0; var bits = 0
    var samples = 0L
    var title = ""; var artist = ""
    var blocks = 0
    while (!last) {
      if (p + 4 > b.length) return dead("truncated")
      last = (b(p) & 0x80) != 0
      val btype = b(p) & 0x7f
      val len = be(b, p + 1, 3).toInt
      if (len > MaxBlockBytes || p + 4 + len > b.length) return dead("truncated")
      if (first && btype != 0) return dead("no-streaminfo")
      btype match {
        case 0 =>
          if (!first) return dead("dup-streaminfo")
          if (len != 34) return dead("bad-streaminfo")
          val packed = be(b, p + 4 + 10, 8)
          rate = ((packed >>> 44) & 0xfffff).toInt
          ch = ((packed >>> 41) & 0x7).toInt + 1
          bits = ((packed >>> 36) & 0x1f).toInt + 1
          samples = packed & ((1L << 36) - 1)
          if (rate <= 0) return dead("bad-streaminfo")
        case 4 =>
          val end = p + 4 + len
          var q = p + 4
          if (q + 4 > end) return dead("bad-comment")
          val vlen = le(b, q, 4).toInt
          q += 4
          if (vlen < 0 || q + vlen + 4 > end) return dead("bad-comment")
          q += vlen
          val n = le(b, q, 4).toInt
          q += 4
          var i = 0
          while (i < n) {
            if (q + 4 > end) return dead("bad-comment")
            val clen = le(b, q, 4).toInt
            q += 4
            if (clen < 0 || q + clen > end) return dead("bad-comment")
            val c = new String(b, q, clen, java.nio.charset.StandardCharsets.UTF_8)
            val eq = c.indexOf('=')
            if (eq > 0) {
              val key = c.substring(0, eq).toUpperCase
              val v = c.substring(eq + 1)
              if (key == "TITLE") title = v
              else if (key == "ARTIST") artist = v
            }
            q += clen
            i += 1
          }
        case _ => () // PADDING/SEEKTABLE/…: skip by length
      }
      blocks += 1
      first = false
      p += 4 + len
    }
    if (rate <= 0) return dead("no-streaminfo")
    FlacInfo(docId, "ok", rate, ch, bits, samples,
      samples * 1000L / rate, title, artist, blocks)
  }

  // ----------------------------------------------------------------- q161

  /** q161: the FLAC scan end to end — build each document's metadata
    * blocks, walk them back (big-endian headers, the little-endian
    * comment island, case-insensitive keys, OCTET-counted lengths);
    * every column replayed by the oracle from doc_id arithmetic.
    */
  def q161FlacScan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => parseFlac(id, buildFlac(id))))
      .toDF()
      .select(col("doc_id"), col("status"),
        col("sample_rate").cast("long").as("sample_rate"),
        col("channels").cast("long").as("channels"),
        col("bits").cast("long").as("bits"),
        col("total_samples"), col("duration_ms"),
        col("title"), col("artist"),
        col("n_blocks").cast("long").as("n_blocks"))
      .orderBy(col("doc_id"))
  }
}
