package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FLAC container scan AND full sample decode — the third audio
  * container beside WAV (q50/52) and MP3 (q153): podcast/archive audio
  * increasingly ships lossless. The metadata a pipeline needs (rate,
  * channels, depth, exact total samples → duration, tags) lives in the
  * metadata blocks BEFORE any frame, so the q161 scan never touches
  * compressed audio; `decodePcm` then decodes the frames themselves —
  * the complete RFC 9639 subframe family (CONSTANT / VERBATIM / FIXED
  * orders 0–4 / LPC with quantized coefficients and shift), Rice
  * residual partitions in both 4- and 5-bit parameter widths with the
  * escape form, wasted bits, all three stereo decorrelations
  * (left/side, right/side, mid/side), UTF-8-coded frame numbers, and
  * CRC-8 / CRC-16 verification — so audio near-dup can fingerprint at
  * the SAMPLE grain and a re-encode of the same recording pairs (the
  * q187 contract; container-payload signatures never could).
  *
  * No libFLAC exists in this build environment, so frame-codec
  * verification is spec-derived rather than foreign: exhaustive
  * encode→decode round-trips over every subframe type, residual form,
  * and decorrelation (the encoder is an independent WRITER of the
  * public format, not the decoder inverted — it chooses predictors by
  * cost), plus hand-pinned bit layouts in the spec.
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

  // ------------------------------------------------------- frame decode

  private final case class Bail(reason: String)
      extends RuntimeException(null, null, false, false)

  /** CRC-8, poly x⁸+x²+x+1 (0x07), init 0 — the frame-header checksum. */
  private val Crc8Table: Array[Int] = Array.tabulate(256) { i =>
    var c = i
    var k = 0
    while (k < 8) { c = if ((c & 0x80) != 0) (c << 1) ^ 0x07 else c << 1; k += 1 }
    c & 0xff
  }

  /** CRC-16, poly x¹⁶+x¹⁵+x²+1 (0x8005), init 0 — the frame checksum. */
  private val Crc16Table: Array[Int] = Array.tabulate(256) { i =>
    var c = i << 8
    var k = 0
    while (k < 8) { c = if ((c & 0x8000) != 0) (c << 1) ^ 0x8005 else c << 1; k += 1 }
    c & 0xffff
  }

  private def crc8(b: Array[Byte], off: Int, len: Int): Int = {
    var c = 0
    var i = 0
    while (i < len) { c = Crc8Table(c ^ (b(off + i) & 0xff)); i += 1 }
    c
  }
  private def crc16(b: Array[Byte], off: Int, len: Int): Int = {
    var c = 0
    var i = 0
    while (i < len) {
      c = ((c << 8) ^ Crc16Table(((c >> 8) ^ (b(off + i) & 0xff)) & 0xff)) & 0xffff
      i += 1
    }
    c
  }

  /** MSB-first bit reader over frame bytes. */
  private final class BitReader(b: Array[Byte], var bytePos: Int) {
    private var bitPos = 0
    def aligned: Boolean = bitPos == 0
    def alignByte(): Unit = if (bitPos != 0) { bitPos = 0; bytePos += 1 }
    def readBit(): Int = {
      if (bytePos >= b.length) throw Bail("truncated-frame")
      val v = (b(bytePos) >> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      v
    }
    def readBits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def readSigned(n: Int): Int = {
      if (n == 0) return 0
      val u = readBits(n)
      // sign-extend from n bits
      ((u << (64 - n)).toLong >> (64 - n)).toInt
    }
    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) {
        q += 1
        if (q > (1 << 24)) throw Bail("unary-overrun")
      }
      q
    }
  }

  /** MSB-first bit writer. */
  private final class BitWriter {
    private val bos = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    def writeBit(v: Int): Unit = {
      cur = (cur << 1) | (v & 1)
      nBits += 1
      if (nBits == 8) { bos.write(cur); cur = 0; nBits = 0 }
    }
    def writeBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { writeBit(((v >>> i) & 1L).toInt); i -= 1 }
    }
    def writeUnary(q: Int): Unit = {
      var i = 0
      while (i < q) { writeBit(0); i += 1 }
      writeBit(1)
    }
    def alignByte(): Unit = while (nBits != 0) writeBit(0)
    def toBytes: Array[Byte] = { alignByte(); bos.toByteArray }
  }

  /** Decoded PCM: channel-interleaved integer samples. */
  final case class FlacPcm(
      sample_rate: Int, channels: Int, bits: Int, samples: Array[Int])

  /** Decode a complete FLAC file to PCM (RFC 9639): metadata walk for
    * STREAMINFO, then every frame — all subframe types, Rice partition
    * residuals (both parameter widths + escape), wasted bits, stereo
    * decorrelation, CRC-8/CRC-16 verified. Left(reason) on anything
    * malformed; allocation bounded by `maxSamples` BEFORE trusting any
    * header field (the bomb-cap discipline).
    */
  def decodePcm(b: Array[Byte], maxSamples: Int = 1 << 24): Either[String, FlacPcm] =
    try Right(decodePcmOrThrow(b, maxSamples))
    catch {
      case x: Bail => Left(x.reason)
      case _: ArrayIndexOutOfBoundsException => Left("malformed")
      case _: NegativeArraySizeException => Left("malformed")
    }

  private def decodePcmOrThrow(b: Array[Byte], maxSamples: Int): FlacPcm = {
    if (b.length < 8 || b(0) != 'f' || b(1) != 'L' || b(2) != 'a' || b(3) != 'C')
      throw Bail("not-flac")
    var p = 4
    var last = false
    var rate = 0; var ch = 0; var bits = 0
    var total = 0L
    var first = true
    while (!last) {
      if (p + 4 > b.length) throw Bail("truncated")
      last = (b(p) & 0x80) != 0
      val btype = b(p) & 0x7f
      val len = be(b, p + 1, 3).toInt
      if (len > MaxBlockBytes || p + 4 + len > b.length) throw Bail("truncated")
      if (first && btype != 0) throw Bail("no-streaminfo")
      if (btype == 0) {
        if (!first) throw Bail("dup-streaminfo")
        if (len != 34) throw Bail("bad-streaminfo")
        val packed = be(b, p + 4 + 10, 8)
        rate = ((packed >>> 44) & 0xfffff).toInt
        ch = ((packed >>> 41) & 0x7).toInt + 1
        bits = ((packed >>> 36) & 0x1f).toInt + 1
        total = packed & ((1L << 36) - 1)
      }
      first = false
      p += 4 + len
    }
    if (rate <= 0) throw Bail("no-streaminfo")
    if (total > maxSamples.toLong || total * ch > maxSamples.toLong)
      throw Bail("output-cap")
    val acc = scala.collection.mutable.ArrayBuilder.make[Int]
    var got = 0L
    while (p < b.length && (total == 0L || got < total)) {
      val (frame, next) = decodeFrame(b, p, rate, ch, bits, maxSamples, got)
      acc ++= frame
      got += frame.length / ch
      p = next
    }
    if (total != 0L && got != total) throw Bail("sample-count-mismatch")
    FlacPcm(rate, ch, bits, acc.result())
  }

  /** UTF-8-style coded number (frame/sample index — RFC 9639 §9.1.5). */
  private def readCodedNumber(br: BitReader): Long = {
    val b0 = br.readBits(8).toInt
    if ((b0 & 0x80) == 0) return b0.toLong
    var nCont = 0
    var mask = 0x40
    while ((b0 & mask) != 0 && nCont < 7) { nCont += 1; mask >>= 1 }
    if (nCont < 1 || nCont > 6) throw Bail("bad-coded-number")
    var v = (b0 & (mask - 1)).toLong
    var i = 0
    while (i < nCont) {
      val c = br.readBits(8).toInt
      if ((c & 0xc0) != 0x80) throw Bail("bad-coded-number")
      v = (v << 6) | (c & 0x3f)
      i += 1
    }
    v
  }

  private def writeCodedNumber(bw: BitWriter, v: Long): Unit = {
    if (v < 0x80) { bw.writeBits(v, 8); return }
    // smallest n (continuation bytes, 1..6) with v < 2^(6n + (6-n))
    var n = 1
    while (n <= 6 && v >= (1L << (6 * n + (6 - n)))) n += 1
    if (n > 6) throw Bail("coded-number-range")
    val prefix = ((0xfe << (6 - n)) & 0xff) |
      ((v >> (6 * n)) & ((1 << (6 - n)) - 1)).toInt
    bw.writeBits(prefix.toLong, 8)
    var i = n - 1
    while (i >= 0) {
      bw.writeBits(0x80L | ((v >> (6 * i)) & 0x3f), 8)
      i -= 1
    }
  }

  /** Decode one frame starting at byte `off`; returns (interleaved
    * samples, next byte offset).
    */
  private def decodeFrame(
      b: Array[Byte], off: Int, siRate: Int, siCh: Int, siBits: Int,
      maxSamples: Int, gotSoFar: Long): (Array[Int], Int) = {
    val br = new BitReader(b, off)
    if (br.readBits(14) != 0x3ffe) throw Bail("bad-sync")
    if (br.readBit() != 0) throw Bail("reserved-bit")
    val variable = br.readBit() == 1
    val bsCode = br.readBits(4).toInt
    val srCode = br.readBits(4).toInt
    val chAsgn = br.readBits(4).toInt
    val bdCode = br.readBits(3).toInt
    if (br.readBit() != 0) throw Bail("reserved-bit")
    val _ = readCodedNumber(br) // frame/sample number (ordering unchecked)
    val blockSize = bsCode match {
      case 0 => throw Bail("reserved-blocksize")
      case 1 => 192
      case n if n >= 2 && n <= 5 => 576 << (n - 2)
      case 6 => br.readBits(8).toInt + 1
      case 7 => br.readBits(16).toInt + 1
      case n => 256 << (n - 8)
    }
    srCode match {
      case 0 => () // from STREAMINFO
      case 12 => val _ = br.readBits(8)
      case 13 | 14 => val _ = br.readBits(16)
      case 15 => throw Bail("bad-samplerate")
      case _ => () // table-coded rates carry no extra field
    }
    val channels = if (chAsgn < 8) chAsgn + 1 else 2
    if (chAsgn > 10) throw Bail("bad-channels")
    if (channels != siCh) throw Bail("channel-mismatch")
    val bps = bdCode match {
      case 0 => siBits
      case 1 => 8
      case 2 => 12
      case 4 => 16
      case 5 => 20
      case 6 => 24
      case 7 => 32
      case _ => throw Bail("bad-bitdepth")
    }
    if (!br.aligned) throw Bail("internal")
    // CRC-8 covers the header bytes BEFORE the crc field
    val want8 = br.readBits(8).toInt
    if (crc8(b, off, br.bytePos - 1 - off) != want8) throw Bail("crc8-mismatch")
    if (gotSoFar + blockSize > maxSamples.toLong ||
      (gotSoFar + blockSize) * channels > maxSamples.toLong)
      throw Bail("output-cap")

    // subframes: side channels carry one extra bit
    val chans = new Array[Array[Int]](channels)
    var c = 0
    while (c < channels) {
      val extra = chAsgn match {
        case 8 => if (c == 1) 1 else 0 // left/side
        case 9 => if (c == 0) 1 else 0 // right(side first)/side: side, right
        case 10 => if (c == 1) 1 else 0 // mid/side
        case _ => 0
      }
      chans(c) = decodeSubframe(br, blockSize, bps + extra)
      c += 1
    }
    br.alignByte()
    val want16 = br.readBits(16).toInt
    if (crc16(b, off, br.bytePos - 2 - off) != want16) throw Bail("crc16-mismatch")

    // undo stereo decorrelation
    chAsgn match {
      case 8 => // left/side: right = left - side
        var i = 0
        while (i < blockSize) { chans(1)(i) = chans(0)(i) - chans(1)(i); i += 1 }
      case 9 => // right/side: stored (side, right); left = side + right
        var i = 0
        while (i < blockSize) {
          val side = chans(0)(i)
          chans(0)(i) = side + chans(1)(i)
          i += 1
        }
      case 10 => // mid/side
        var i = 0
        while (i < blockSize) {
          var mid = chans(0)(i)
          val side = chans(1)(i)
          mid = (mid << 1) | (side & 1)
          chans(0)(i) = (mid + side) >> 1
          chans(1)(i) = (mid - side) >> 1
          i += 1
        }
      case _ => ()
    }
    val outArr = new Array[Int](blockSize * channels)
    var i = 0
    while (i < blockSize) {
      var cc = 0
      while (cc < channels) {
        outArr(i * channels + cc) = chans(cc)(i)
        cc += 1
      }
      i += 1
    }
    val _ = (variable, siRate)
    (outArr, br.bytePos)
  }

  private def decodeSubframe(br: BitReader, n: Int, bps: Int): Array[Int] = {
    if (br.readBit() != 0) throw Bail("subframe-padding")
    val stype = br.readBits(6).toInt
    var wasted = 0
    if (br.readBit() == 1) wasted = br.readUnary() + 1
    val ebps = bps - wasted
    if (ebps <= 0 || ebps > 33) throw Bail("bad-subframe-bps")
    val out = new Array[Int](n)
    if (stype == 0) { // CONSTANT
      val v = br.readSigned(ebps)
      java.util.Arrays.fill(out, v)
    } else if (stype == 1) { // VERBATIM
      var i = 0
      while (i < n) { out(i) = br.readSigned(ebps); i += 1 }
    } else if ((stype & 0x38) == 0x08 && (stype & 7) <= 4) { // FIXED
      val order = stype & 7
      var i = 0
      while (i < order) { out(i) = br.readSigned(ebps); i += 1 }
      decodeResidual(br, n, order, out)
      i = order
      while (i < n) {
        val p = order match {
          case 0 => 0L
          case 1 => out(i - 1).toLong
          case 2 => 2L * out(i - 1) - out(i - 2)
          case 3 => 3L * out(i - 1) - 3L * out(i - 2) + out(i - 3)
          case _ => 4L * out(i - 1) - 6L * out(i - 2) + 4L * out(i - 3) -
            out(i - 4)
        }
        out(i) = (out(i) + p).toInt
        i += 1
      }
    } else if ((stype & 0x20) != 0) { // LPC
      val order = (stype & 0x1f) + 1
      if (order > n) throw Bail("lpc-order")
      var i = 0
      while (i < order) { out(i) = br.readSigned(ebps); i += 1 }
      val precision = br.readBits(4).toInt + 1
      if (precision == 16) throw Bail("lpc-precision")
      val shift = br.readSigned(5)
      if (shift < 0) throw Bail("lpc-shift")
      val coefs = new Array[Int](order)
      i = 0
      while (i < order) { coefs(i) = br.readSigned(precision); i += 1 }
      decodeResidual(br, n, order, out)
      i = order
      while (i < n) {
        var acc = 0L
        var j = 0
        while (j < order) { acc += coefs(j).toLong * out(i - 1 - j); j += 1 }
        out(i) = (out(i) + (acc >> shift)).toInt
        i += 1
      }
    } else throw Bail("reserved-subframe")
    if (wasted > 0) {
      var i = 0
      while (i < n) { out(i) = out(i) << wasted; i += 1 }
    }
    out
  }

  /** Rice-partitioned residual (RFC 9639 §9.2.7) decoded INTO
    * `out(order until n)` (as raw residuals; prediction applied by the
    * caller).
    */
  private def decodeResidual(
      br: BitReader, n: Int, order: Int, out: Array[Int]): Unit = {
    val method = br.readBits(2).toInt
    if (method > 1) throw Bail("reserved-residual")
    val pBits = if (method == 0) 4 else 5
    val escape = (1 << pBits) - 1
    val po = br.readBits(4).toInt
    val parts = 1 << po
    if ((n & (parts - 1)) != 0) throw Bail("bad-partitions")
    var idx = order
    var part = 0
    while (part < parts) {
      val count = (n >> po) - (if (part == 0) order else 0)
      if (count < 0) throw Bail("bad-partitions")
      val param = br.readBits(pBits).toInt
      if (param == escape) {
        val raw = br.readBits(5).toInt
        var i = 0
        while (i < count) { out(idx) = br.readSigned(raw); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < count) {
          val q = br.readUnary()
          val u = (q.toLong << param) | br.readBits(param)
          out(idx) = ((u >>> 1) ^ -(u & 1L)).toInt
          idx += 1
          i += 1
        }
      }
      part += 1
    }
    if (idx != n) throw Bail("residual-count")
  }

  // ------------------------------------------------------- frame encode

  /** Conforming FLAC ENCODER (corpus construction — the Jpeg/Gif/Vp8
    * precedent): STREAMINFO + frames of `blockSize`, per-subframe type
    * chosen by cost (CONSTANT when flat, else best FIXED order 0–2 by
    * absolute-residual sum) with a single Rice partition (escape form
    * when residuals outgrow the parameter range). `force` pins a
    * subframe type for coverage tests: "verbatim", "lpc" (order-2
    * quantized coefficients — the [2,-1] predictor through the real
    * coefficient/shift fields), "escape", or "wasted" (encodes the
    * common low-zero-bit count through the wasted-bits field).
    * `stereo` picks the decorrelation for 2-channel input: "indep",
    * "leftside", "rightside", "midside".
    */
  private[graft] def encodeFlac(
      samples: Array[Int], channels: Int, sampleRate: Int, bits: Int = 16,
      blockSize: Int = 4096, force: String = "", stereo: String = "indep"): Array[Byte] = {
    require(channels >= 1 && channels <= 8 && samples.length > 0 &&
      samples.length % channels == 0)
    val nTotal = samples.length / channels
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("fLaC".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val si = new Array[Byte](34)
    si(0) = ((blockSize >> 8) & 0xff).toByte; si(1) = (blockSize & 0xff).toByte
    si(2) = si(0); si(3) = si(1)
    val packed = (sampleRate.toLong << 44) | ((channels - 1).toLong << 41) |
      ((bits - 1).toLong << 36) | (nTotal.toLong & ((1L << 36) - 1))
    var i = 0
    while (i < 8) { si(10 + i) = ((packed >>> (8 * (7 - i))) & 0xff).toByte; i += 1 }
    bos.write(0x80); bos.write(be24(34)); bos.write(si)
    var frameIdx = 0L
    var pos = 0
    while (pos < nTotal) {
      val n = math.min(blockSize, nTotal - pos)
      bos.write(encodeFrame(samples, channels, pos, n, bits,
        frameIdx, force, stereo))
      frameIdx += 1
      pos += n
    }
    bos.toByteArray
  }

  private def encodeFrame(
      samples: Array[Int], channels: Int, pos: Int, n: Int, bits: Int,
      frameIdx: Long, force: String, stereo: String): Array[Byte] = {
    val bw = new BitWriter()
    bw.writeBits(0x3ffe, 14)
    bw.writeBit(0) // reserved
    bw.writeBit(0) // fixed blocking strategy
    bw.writeBits(7, 4) // block size: explicit 16-bit field
    bw.writeBits(0, 4) // sample rate: from STREAMINFO
    val chAsgn =
      if (channels == 2) stereo match {
        case "leftside" => 8
        case "rightside" => 9
        case "midside" => 10
        case _ => 1
      } else channels - 1
    bw.writeBits(chAsgn.toLong, 4)
    val bdCode = bits match {
      case 8 => 1; case 12 => 2; case 16 => 4; case 20 => 5; case 24 => 6
      case 32 => 7; case _ => 0
    }
    bw.writeBits(bdCode.toLong, 3)
    bw.writeBit(0) // reserved
    writeCodedNumber(bw, frameIdx)
    bw.writeBits((n - 1).toLong, 16)
    val headerNoCrc = bw.toBytes // byte-aligned here by construction
    val h8 = crc8(headerNoCrc, 0, headerNoCrc.length)
    val bw2 = new BitWriter()

    // channel planes (with decorrelation)
    val planes = new Array[Array[Int]](channels)
    var c = 0
    while (c < channels) {
      val a = new Array[Int](n)
      var i = 0
      while (i < n) { a(i) = samples((pos + i) * channels + c); i += 1 }
      planes(c) = a
      c += 1
    }
    var extraBits = new Array[Int](channels)
    if (channels == 2 && chAsgn >= 8) {
      val l = planes(0); val r = planes(1)
      val side = new Array[Int](n)
      var i = 0
      while (i < n) { side(i) = l(i) - r(i); i += 1 }
      chAsgn match {
        case 8 => planes(1) = side; extraBits = Array(0, 1)
        case 9 => planes(0) = side; extraBits = Array(1, 0)
        case _ =>
          val mid = new Array[Int](n)
          i = 0
          while (i < n) { mid(i) = (l(i) + r(i)) >> 1; i += 1 }
          planes(0) = mid; planes(1) = side; extraBits = Array(0, 1)
      }
    }
    c = 0
    while (c < channels) {
      encodeSubframe(bw2, planes(c), bits + extraBits(c), force)
      c += 1
    }
    val body = bw2.toBytes
    val all = new java.io.ByteArrayOutputStream()
    all.write(headerNoCrc); all.write(h8)
    all.write(body)
    val frameBytes = all.toByteArray
    val f16 = crc16(frameBytes, 0, frameBytes.length)
    all.write((f16 >> 8) & 0xff); all.write(f16 & 0xff)
    all.toByteArray
  }

  private def encodeSubframe(
      bw: BitWriter, s0: Array[Int], bps0: Int, force: String): Unit = {
    val n = s0.length
    bw.writeBit(0)
    // wasted bits: only when forced (corpus samples rarely share them)
    var wasted = 0
    var s = s0
    var bps = bps0
    if (force == "wasted") {
      var w = 32
      var i = 0
      while (i < n && w > 0) {
        val v = s0(i)
        if (v != 0) w = math.min(w, java.lang.Integer.numberOfTrailingZeros(v))
        i += 1
      }
      if (w > 0 && w < bps0) {
        wasted = w
        s = s0.map(_ >> w)
        bps = bps0 - w
      }
    }
    val allEqual = n > 0 && s.forall(_ == s(0))
    if (force == "verbatim") {
      bw.writeBits(1, 6)
      writeWasted(bw, wasted)
      var i = 0
      while (i < n) { bw.writeBits(maskBits(s(i), bps), bps); i += 1 }
    } else if (force == "lpc" && n > 2) {
      bw.writeBits(0x20L | (2 - 1), 6) // LPC order 2
      writeWasted(bw, wasted)
      bw.writeBits(maskBits(s(0), bps), bps)
      bw.writeBits(maskBits(s(1), bps), bps)
      bw.writeBits(3 - 1, 4) // precision 3
      bw.writeBits(0, 5) // shift 0
      bw.writeBits(maskBits(2, 3), 3) // coef[0] = 2
      bw.writeBits(maskBits(-1, 3), 3) // coef[1] = -1
      val res = new Array[Int](n)
      var i = 2
      while (i < n) { res(i) = s(i) - (2 * s(i - 1) - s(i - 2)); i += 1 }
      writeResidual(bw, res, 2, force == "escape")
    } else if (allEqual && force != "escape") {
      bw.writeBits(0, 6)
      writeWasted(bw, wasted)
      bw.writeBits(maskBits(if (n > 0) s(0) else 0, bps), bps)
    } else {
      // best FIXED order 0..2 by absolute residual sum
      var best = 0
      var bestCost = Long.MaxValue
      var o = 0
      while (o <= math.min(2, n)) {
        var cost = 0L
        var i = o
        while (i < n) {
          val r = o match {
            case 0 => s(i).toLong
            case 1 => s(i).toLong - s(i - 1)
            case _ => s(i).toLong - 2L * s(i - 1) + s(i - 2)
          }
          cost += math.abs(r)
          i += 1
        }
        if (cost < bestCost) { bestCost = cost; best = o }
        o += 1
      }
      val order = best
      bw.writeBits(0x08L | order, 6)
      writeWasted(bw, wasted)
      var i = 0
      while (i < order) { bw.writeBits(maskBits(s(i), bps), bps); i += 1 }
      val res = new Array[Int](n)
      i = order
      while (i < n) {
        res(i) = order match {
          case 0 => s(i)
          case 1 => s(i) - s(i - 1)
          case _ => (s(i).toLong - 2L * s(i - 1) + s(i - 2)).toInt
        }
        i += 1
      }
      writeResidual(bw, res, order, force == "escape")
    }
  }

  private def writeWasted(bw: BitWriter, wasted: Int): Unit =
    if (wasted == 0) bw.writeBit(0)
    else { bw.writeBit(1); bw.writeUnary(wasted - 1) }

  private def maskBits(v: Int, n: Int): Long =
    v.toLong & ((1L << n) - 1)

  /** One-partition Rice residual; `forceEscape` pins the escape form. */
  private def writeResidual(
      bw: BitWriter, res: Array[Int], order: Int, forceEscape: Boolean): Unit = {
    val n = res.length
    bw.writeBits(0, 2) // 4-bit Rice parameters
    bw.writeBits(0, 4) // partition order 0
    val count = n - order
    if (forceEscape) {
      var maxBits = 1
      var i = order
      while (i < n) {
        val need = 33 - java.lang.Integer.numberOfLeadingZeros(
          if (res(i) < 0) ~res(i) else res(i))
        maxBits = math.max(maxBits, math.max(need, 1))
        i += 1
      }
      if (maxBits > 31) maxBits = 31
      bw.writeBits(15, 4) // escape
      bw.writeBits(maxBits.toLong, 5)
      i = order
      while (i < n) { bw.writeBits(maskBits(res(i), maxBits), maxBits); i += 1 }
      return
    }
    // rice parameter from the mean folded magnitude
    var sum = 0L
    var i = order
    while (i < n) {
      val r = res(i).toLong
      sum += (if (r >= 0) r << 1 else (-r << 1) - 1)
      i += 1
    }
    var k = 0
    if (count > 0) {
      val mean = sum / count
      while (k < 14 && (1L << (k + 1)) < mean + 1) k += 1
    }
    bw.writeBits(k.toLong, 4)
    i = order
    while (i < n) {
      val r = res(i).toLong
      val u = if (r >= 0) r << 1 else (-r << 1) - 1
      bw.writeUnary((u >>> k).toInt)
      bw.writeBits(u & ((1L << k) - 1), k)
      i += 1
    }
  }
}
