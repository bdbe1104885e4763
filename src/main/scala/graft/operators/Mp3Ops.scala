package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MP3 container scan — the audio sibling of the MP4 box walk (q137):
  * per-record metadata (ID3v2 text frames) plus the frame-header walk
  * that yields CBR/VBR, bitrate, sample rate, frame count, and
  * duration WITHOUT decoding audio — exactly what a crawl pipeline
  * needs to dedup/filter/sample audio it will never play. Samples stay
  * opaque payloads; no MDCT decode is claimed (the Mp4Ops boundary).
  *
  * LAYER III SAMPLE DECODE: PERMANENTLY WAIVED (round 20, the D4
  * form). Why it cannot meet this repo's verification standard in
  * this container: (1) no mp3 implementation exists here — no
  * libmpg123/libmad/lame/ffmpeg, no Python audio module — so there is
  * NOTHING FOREIGN to pin a decoder against, and every other lossy
  * decoder in this repo (JPEG, VP8, PNG, TIFF, FLAC, G.711) earned
  * its place through foreign fixtures or hand-pinned spec vectors
  * cross-checked against a second implementation; (2) a correct
  * Layer III decoder REQUIRES thousands of published constants — 34
  * Huffman code tables (~2 000 entries), scalefactor-band boundary
  * tables per sample rate, the 512-coefficient synthesis window D[],
  * aliasing-butterfly coefficients — which cannot be reproduced from
  * memory with zero egress at the fidelity a decoder needs (one wrong
  * window coefficient yields plausible-but-wrong PCM that no test
  * here could catch); (3) the degenerate-stream fallback (silence /
  * single tone) only exercises the zero path or depends on exactly
  * the unverifiable window table, so it would pin structure, not
  * correctness — a self-referential test, not verification. The scan
  * boundary above (tags, framing, timing — everything a curation
  * pipeline consumes) is therefore this operator's permanent,
  * deliberate surface; revisit only in an environment with an mp3
  * reference implementation to fixture against (same resolution form
  * as SURVEY §2.3 D4). See IMPLEMENTATION.md "MP3 decode waiver".
  *
  * The walk (public MPEG-1 audio framing + the informal ID3 specs):
  *   - an ID3v2.3 tag (`ID3`, version, flags, SYNCSAFE 28-bit size —
  *     7 bits per byte so the size can never alias a frame sync) is
  *     skipped by size, its `TIT2`/`TPE1` text frames (big-endian
  *     plain sizes, encoding byte 0 = ISO-8859-1) read on the way;
  *   - then MPEG-1 Layer III frames: 11-bit sync, version/layer bits
  *     checked, bitrate/samplerate table lookups (free-form 0 and
  *     invalid 15 dead-letter), frame length
  *     `144 * bitrate / samplerate + padding` — the walk advances by
  *     COMPUTED length, never by sync scanning (payload bytes may
  *     contain 0xFF sync patterns, planted by the corpus);
  *   - a trailing 128-byte ID3v1 tag (`TAG`) ends the stream cleanly.
  *
  * Error-as-value: bad table indices / non-MPEG1-L3 headers / a frame
  * running past EOF end the walk at the lie with every prior frame
  * counted (`bad-frame` / `truncated`); an absent ID3v2 tag is fine
  * (frames may start at byte 0).
  *
  * The q153 corpus builds a real tagged CBR stream per document from
  * doc_id arithmetic (bitrate/samplerate/frame-count/padding periods)
  * and the oracle replays title, artist, bitrate, sample rate, frame
  * count, and integer duration without seeing a container byte.
  *
  * Scale shape (100 TB): per-row byte walker via `mapPartitions`,
  * zero shuffle before the output sort.
  */
object Mp3Ops {

  /** MPEG-1 Layer III bitrate table (kbps), index 0 = free, 15 = bad. */
  private[graft] val Bitrates =
    Array(-1, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, -1)

  /** MPEG-1 sample rates, index 3 reserved. */
  private[graft] val SampleRates = Array(44100, 48000, 32000, -1)

  final case class Mp3Info(
      doc_id: Long, status: String, title: String, artist: String,
      mode: String, bitrate_kbps: Int, sample_rate: Int, n_frames: Int,
      duration_ms: Long)

  // --------------------------------------------------------------- encode

  private def syncsafe(v: Int): Array[Byte] = Array(
    ((v >>> 21) & 0x7f).toByte, ((v >>> 14) & 0x7f).toByte,
    ((v >>> 7) & 0x7f).toByte, (v & 0x7f).toByte)

  private def id3TextFrame(id: String, text: String): Array[Byte] = {
    val ascii = java.nio.charset.StandardCharsets.ISO_8859_1
    val body = Array(0.toByte) ++ text.getBytes(ascii) // encoding 0 = ISO-8859-1
    id.getBytes(ascii) ++ Array(
      ((body.length >>> 24) & 0xff).toByte, ((body.length >>> 16) & 0xff).toByte,
      ((body.length >>> 8) & 0xff).toByte, (body.length & 0xff).toByte,
      0.toByte, 0.toByte) ++ body
  }

  private[graft] def buildId3v2(title: String, artist: String): Array[Byte] = {
    val body = id3TextFrame("TIT2", title) ++ id3TextFrame("TPE1", artist)
    "ID3".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++
      Array(3.toByte, 0.toByte, 0.toByte) ++ syncsafe(body.length) ++ body
  }

  /** One tagged CBR stream per document: bitrate period 3, sample-rate
    * period 2, `8 + id % 12` frames with alternating padding, payloads
    * carrying PLANTED 0xFF sync bytes (the walk must advance by
    * computed length), a trailing ID3v1 tag.
    */
  private[graft] def buildMp3(id: Long): Array[Byte] = {
    val brIdx = 9 + (id % 3).toInt * 2 // 128 / 192 / 256 kbps
    val srIdx = (id % 2).toInt
    val n = 8 + (id % 12).toInt
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(buildId3v2("Track " + id, "Artist " + (id % 20)))
    var j = 0
    while (j < n) {
      val pad = ((id + j) % 2).toInt
      val flen = 144 * Bitrates(brIdx) * 1000 / SampleRates(srIdx) + pad
      bos.write(0xff)
      bos.write(0xfb) // MPEG1, Layer III, no CRC
      bos.write((brIdx << 4) | (srIdx << 2) | (pad << 1))
      bos.write(0x00)
      var i = 4
      while (i < flen) { bos.write(if (i % 7 == 0) 0xff else (id + i).toInt & 0x7f); i += 1 }
      j += 1
    }
    bos.write("TAG".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    bos.write(new Array[Byte](125))
    bos.toByteArray
  }

  /** Build a VBR stream whose frame PAYLOADS are the given blobs:
    * MPEG-1 Layer III at 48 kHz quantizes frame length to
    * `3 × bitrate_kbps`, so the 32/40/48 kbps cells carry exactly
    * 92/116/140 payload bytes after the 4-byte header — the three
    * lengths the q183 cross-container payloads use. An ID3v1 `TAG`
    * closes the stream (the q153 clean end).
    */
  private[graft] def buildMp3Frames(payloads: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    payloads.foreach { p =>
      require(p.length == 92 || p.length == 116 || p.length == 140,
        s"q183 frames carry 92/116/140-byte payloads, got ${p.length}")
      val brIdx = 1 + (p.length - 92) / 24 // 32 / 40 / 48 kbps
      bos.write(0xff)
      bos.write(0xfb) // MPEG1, Layer III, no CRC
      bos.write((brIdx << 4) | (1 << 2)) // 48 kHz, no pad
      bos.write(0x00)
      bos.write(p, 0, p.length)
    }
    bos.write("TAG".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    bos.write(new Array[Byte](125))
    bos.toByteArray
  }

  /** The frame PAYLOAD layer of a stream: the q153 computed-length
    * walk (ID3v2 skip, sync check, header arithmetic), emitting each
    * frame's bytes past its 4-byte header; the walk ends at the ID3v1
    * tag or the first non-sync byte — a torn trailing frame emits
    * nothing (the container walkers' intact-prefix discipline).
    */
  private[graft] def framePayloads(b: Array[Byte]): Seq[Array[Byte]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var p = readId3v2(b)._3
    var go = true
    while (go && p + 4 <= b.length) {
      if ((b(p) & 0xff) == 0xff && (b(p + 1) & 0xe0) == 0xe0) {
        val brIdx = (b(p + 2) & 0xf0) >> 4
        val srIdx = (b(p + 2) & 0x0c) >> 2
        val pad = (b(p + 2) & 0x02) >> 1
        if (Bitrates(brIdx) < 0 || SampleRates(srIdx) < 0) go = false
        else {
          val flen = 144 * Bitrates(brIdx) * 1000 / SampleRates(srIdx) + pad
          if (p + flen > b.length) go = false
          else {
            out += java.util.Arrays.copyOfRange(b, p + 4, p + flen)
            p += flen
          }
        }
      } else go = false
    }
    out.toSeq
  }

  // ----------------------------------------------------------------- walk

  /** ID3v2 text frames + past-the-tag offset; (title, artist, offset). */
  private def readId3v2(b: Array[Byte]): (String, String, Int) = {
    if (b.length < 10 || b(0) != 'I' || b(1) != 'D' || b(2) != '3')
      return ("", "", 0)
    val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
      ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
    val end = math.min(10 + size, b.length)
    var title = ""
    var artist = ""
    var p = 10
    var go = true
    while (go && p + 10 <= end) {
      val fid = new String(b, p, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
      val flen = ((b(p + 4) & 0xff) << 24) | ((b(p + 5) & 0xff) << 16) |
        ((b(p + 6) & 0xff) << 8) | (b(p + 7) & 0xff)
      if (flen < 0 || p + 10 + flen > end) go = false
      else {
        if ((fid == "TIT2" || fid == "TPE1") && flen >= 1 && b(p + 10) == 0) {
          val text = new String(b, p + 11, flen - 1,
            java.nio.charset.StandardCharsets.ISO_8859_1)
          if (fid == "TIT2") title = text else artist = text
        }
        p += 10 + flen
      }
    }
    (title, artist, end)
  }

  /** The frame walk; advances by computed length only. */
  private[graft] def parseMp3(docId: Long, b: Array[Byte]): Mp3Info = {
    val (title, artist, off) = readId3v2(b)
    def done(status: String, brs: Set[Int], br0: Int, sr0: Int, n: Int): Mp3Info = {
      val mode = if (n == 0) "" else if (brs.size == 1) "cbr" else "vbr"
      val dur = if (sr0 > 0) n.toLong * 1152L * 1000L / sr0 else 0L
      Mp3Info(docId, status, title, artist, mode,
        if (n > 0) br0 else 0, if (n > 0) sr0 else 0, n, dur)
    }
    var p = off
    var n = 0
    var br0 = 0
    var sr0 = 0
    val brs = scala.collection.mutable.Set.empty[Int]
    while (true) {
      if (p >= b.length ||
          (b.length - p >= 3 && b(p) == 'T' && b(p + 1) == 'A' && b(p + 2) == 'G'))
        return done(if (n > 0) "ok" else "no-frames", brs.toSet, br0, sr0, n)
      if (p + 4 > b.length) return done("truncated", brs.toSet, br0, sr0, n)
      if ((b(p) & 0xff) != 0xff || (b(p + 1) & 0xe0) != 0xe0)
        return done(if (n > 0) "bad-frame" else "no-frames", brs.toSet, br0, sr0, n)
      // MPEG-1 (version bits 11), Layer III (01) — anything else is out of scope
      if ((b(p + 1) & 0x1e) != 0x1a)
        return done("unsupported", brs.toSet, br0, sr0, n)
      val brIdx = (b(p + 2) & 0xf0) >>> 4
      val srIdx = (b(p + 2) & 0x0c) >>> 2
      val pad = (b(p + 2) & 0x02) >>> 1
      if (Bitrates(brIdx) < 0 || SampleRates(srIdx) < 0)
        return done("bad-frame", brs.toSet, br0, sr0, n)
      val flen = 144 * Bitrates(brIdx) * 1000 / SampleRates(srIdx) + pad
      if (p + flen > b.length) return done("truncated", brs.toSet, br0, sr0, n)
      if (n == 0) { br0 = Bitrates(brIdx); sr0 = SampleRates(srIdx) }
      brs += brIdx
      n += 1
      p += flen
    }
    throw new IllegalStateException("unreachable")
  }

  // ----------------------------------------------------------------- q153

  /** q153: the MP3 scan end to end — build each document's tagged CBR
    * stream, skip the syncsafe tag reading its text frames, walk the
    * frames by computed length; every column replayed by the oracle
    * from doc_id arithmetic.
    */
  def q153Mp3Scan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => parseMp3(id, buildMp3(id))))
      .toDF()
      .select(col("doc_id"), col("status"), col("title"), col("artist"),
        col("mode"),
        col("bitrate_kbps").cast("long").as("bitrate_kbps"),
        col("sample_rate").cast("long").as("sample_rate"),
        col("n_frames").cast("long").as("n_frames"),
        col("duration_ms"))
      .orderBy(col("doc_id"))
  }
}
