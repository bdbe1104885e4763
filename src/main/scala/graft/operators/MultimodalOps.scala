package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets

/** Multimodal asset handling: media as opaque binary columns with typed
  * metadata structs, plus the decode / feature-extract / resize /
  * frame-sample pipeline a training-data platform runs over them.
  *
  * The decode step carries REAL dependency-free codecs for all three
  * modalities — uncompressed 24-bpp Windows BMP (`decodeBmp`), PCM WAV
  * (`decodeWav`), and uncompressed-DIB AVI video (`decodeAvi`, the same
  * RIFF chunk walk as WAV wrapped around per-frame BMP-style pixel
  * grids), each parsed from its public header layout — with a
  * deterministic byte-histogram FALLBACK for every other payload (the
  * documents-derived test assets are text bytes and land there). Around
  * the codec everything is the Spark plumbing a production pipeline
  * needs: binary schema, per-partition batched iteration, typed feature
  * output that composes with SimilarityOps, and partition-preserving
  * frame explosion. Swapping in a heavier codec library (JPEG/FLAC/mp4)
  * changes only the dispatch inside `decodeBytes`.
  */
object MultimodalOps {

  /** Typed asset row: payload is an opaque binary column; metadata is a
    * typed struct (SURVEY §1.1's binary-blob + fixed-schema pattern).
    */
  final case class AssetRow(
      asset_id: Long, media_type: String, payload: Array[Byte],
      width: Int, height: Int, format: String)

  final case class FeatureRow(asset_id: Long, media_type: String, features: Array[Float])

  /** Derive a deterministic asset table from the documents corpus: the text
    * bytes stand in for encoded media; metadata is computed from stable
    * row attributes. (The driver testdata ships no real media.)
    */
  def assets(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .repartition(col("doc_id"))
      .select(
        col("doc_id").as("asset_id"),
        element_at(typedlit(Seq("image", "audio", "video")), (col("doc_id") % 3 + 1).cast("int"))
          .as("media_type"),
        encode(col("text"), "UTF-8").as("payload"),
        (lit(16) + pmod(col("n_chars"), lit(64))).cast("int").as("width"),
        (lit(16) + pmod(col("n_chars") * 7, lit(64))).cast("int").as("height"),
        element_at(typedlit(Seq("png", "wav", "mp4")), (col("doc_id") % 3 + 1).cast("int"))
          .as("format"))

  /** A genuinely decodable asset: payload is REAL container bytes
    * (`encodeBmp`/`encodeWav` output) that round-trip through the codecs.
    */
  final case class DecodableAsset(asset_id: Long, media_type: String, payload: Array[Byte])

  /** Derive an asset table whose image/audio payloads are REAL container
    * bytes — deterministic 24-bpp BMPs and 16-bit PCM WAVs whose header
    * and content parameters are pure arithmetic on `doc_id`, so an
    * independent oracle can recompute every decoded value without owning
    * the codecs. This is the table q43 runs over: unlike `assets()` (text
    * bytes standing in for media, kept stable for q25/q26's hashes), every
    * row here exercises the real-decode branch of `decodeBytes`. Video
    * rows live in `decodableVideos` (real AVI containers, q48) — kept
    * separate so q43's pinned oracle surface stays image+audio.
    */
  def decodableAssets(spark: SparkSession, dir: String): Dataset[DecodableAsset] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"))
      .where(col("doc_id") % 3 < 2)
      .repartition(col("doc_id"))
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          if (id % 3 == 0)
            DecodableAsset(id, "image", encodeBmpConst(
              (8 + id % 16).toInt, (8 + (id * 3) % 16).toInt,
              (id % 256).toInt, (id * 7 % 256).toInt, (id * 13 % 256).toInt))
          else
            DecodableAsset(id, "audio", encodeWavSilence(
              (8000 + (id % 8) * 1000).toInt, (1 + id % 2).toInt,
              (64 + id % 128).toInt))
        }
      }
  }

  /** Decoded uncompressed image: `pixels` is BGR row-major, TOP-DOWN
    * (BMP's default bottom-up row storage is unflipped during decode).
    */
  final case class BmpImage(width: Int, height: Int, bpp: Int, pixels: Array[Byte])

  /** Decoded PCM audio: samples channel-interleaved, normalized to [-1, 1]. */
  final case class WavAudio(
      sampleRate: Int, channels: Int, bitsPerSample: Int, samples: Array[Float])

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
      ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
  private def putLe16(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = v.toByte; b(o + 1) = (v >>> 8).toByte
  }
  private def putLe32(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = v.toByte; b(o + 1) = (v >>> 8).toByte
    b(o + 2) = (v >>> 16).toByte; b(o + 3) = (v >>> 24).toByte
  }

  /** BMP writer — the exact inverse of `decodeBmp` (uncompressed 24-bpp,
    * bottom-up rows padded to 4 bytes): `pixels` is BGR row-major TOP-DOWN,
    * `decodeBmp(encodeBmp(w, h, px)).pixels == px` by round-trip test.
    */
  def encodeBmp(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && pixels.length == width * height * 3,
      s"pixels must be $width*$height*3 BGR bytes")
    val rowSize = ((24 * width + 31) / 32) * 4
    val out = new Array[Byte](54 + rowSize * height)
    out(0) = 'B'; out(1) = 'M'
    putLe32(out, 2, out.length)
    putLe32(out, 10, 54) // pixel offset
    putLe32(out, 14, 40) // BITMAPINFOHEADER
    putLe32(out, 18, width)
    putLe32(out, 22, height) // positive: bottom-up storage
    putLe16(out, 26, 1) // planes
    putLe16(out, 28, 24) // bpp
    putLe32(out, 30, 0) // BI_RGB
    putLe32(out, 34, rowSize * height)
    var r = 0
    while (r < height) {
      // file row r holds the (height-1-r)-th top-down pixel row
      System.arraycopy(pixels, (height - 1 - r) * width * 3, out, 54 + r * rowSize, width * 3)
      r += 1
    }
    out
  }

  /** Constant-color BMP: every pixel (b, g, r) — the mean-channel values
    * decode back EXACTLY, which is what makes q43 oracle-checkable.
    */
  def encodeBmpConst(width: Int, height: Int, b: Int, g: Int, r: Int): Array[Byte] = {
    val px = new Array[Byte](width * height * 3)
    var i = 0
    while (i < px.length) {
      px(i) = b.toByte; px(i + 1) = g.toByte; px(i + 2) = r.toByte
      i += 3
    }
    encodeBmp(width, height, px)
  }

  /** WAV writer — the inverse of `decodeWav` for 16-bit integer PCM:
    * canonical 44-byte RIFF/fmt/data layout, `nSamples` TOTAL
    * channel-interleaved silent samples (sample content is irrelevant to
    * the header-derived q43 columns; silence keeps the bytes deterministic).
    */
  def encodeWavSilence(sampleRate: Int, channels: Int, nSamples: Int): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && nSamples >= 0)
    val dataLen = nSamples * 2
    val out = new Array[Byte](44 + dataLen)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putLe32(out, 4, 36 + dataLen)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    putLe32(out, 16, 16) // fmt chunk size
    putLe16(out, 20, 1) // integer PCM
    putLe16(out, 22, channels)
    putLe32(out, 24, sampleRate)
    putLe32(out, 28, sampleRate * channels * 2) // byte rate
    putLe16(out, 32, channels * 2) // block align
    putLe16(out, 34, 16) // bits per sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    putLe32(out, 40, dataLen)
    out // sample bytes stay zero = silence
  }

  /** REAL BMP codec (public format layout, no dependencies): 14-byte file
    * header ('BM', file size, reserved, pixel offset @10) + info header
    * (size @14, signed width @18 / height @22, planes @26, bpp @28,
    * compression @30); pixel rows padded to 4 bytes, bottom-up unless
    * height < 0. Supports the uncompressed 24-bpp form; anything else is
    * `None` — error-as-value, a malformed asset must not kill a partition
    * (the D15 discipline applied to media bytes).
    */
  def decodeBmp(b: Array[Byte]): Option[BmpImage] = {
    if (b == null || b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val off = le32(b, 10)
    val hdrSize = le32(b, 14)
    val w = le32(b, 18)
    val h = le32(b, 22)
    val bpp = le16(b, 28)
    val comp = le32(b, 30)
    if (hdrSize < 40 || comp != 0 || bpp != 24 || w <= 0 || h == 0 || off < 54) return None
    val topDown = h < 0
    // ALL header-derived sizes go through Long arithmetic: a hostile width
    // near 2^31/24 overflows `24*w` to a negative Int and defeats every
    // later bounds check (and abs(Int.MinValue) is still negative) — a
    // malformed asset must return None, never throw
    val ah = math.abs(h.toLong)
    val rowSize = ((24L * w + 31L) / 32L) * 4L
    if (off.toLong + rowSize * ah > b.length || w.toLong * ah * 3L > Int.MaxValue)
      return None
    val out = new Array[Byte]((w * ah * 3L).toInt)
    var r = 0
    while (r < ah) {
      val srcRow = if (topDown) r else ah - 1 - r
      System.arraycopy(b, (off + srcRow * rowSize).toInt, out, (r.toLong * w * 3L).toInt, w * 3)
      r += 1
    }
    Some(BmpImage(w, ah.toInt, bpp, out))
  }

  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 24) | ((b(o + 1) & 0xFF) << 16) |
      ((b(o + 2) & 0xFF) << 8) | (b(o + 3) & 0xFF)
  private def putBe32(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v >>> 24).toByte; b(o + 1) = (v >>> 16).toByte
    b(o + 2) = (v >>> 8).toByte; b(o + 3) = v.toByte
  }

  /** PNG Paeth predictor (RFC 2083 §6.6) — shared by encoder and decoder. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** PNG signature bytes (public spec). */
  private val PngSig: Array[Int] = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)

  /** PNG writer (public spec layout, zlib via JDK `Deflater` — zero new
    * dependencies): 8-bit truecolor (color type 2), non-interlaced, one
    * IHDR + one IDAT + IEND, CRC32 over chunk type+data. `rgb` is RGB
    * row-major TOP-DOWN. Each scanline's filter is `row % 5`, so a single
    * round-trip exercises ALL FIVE standard filters (None/Sub/Up/Average/
    * Paeth) against the decoder — a filter-0-only writer would leave the
    * decoder's filter arms untested.
    */
  def encodePng(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && rgb.length == width * height * 3,
      s"rgb must be $width*$height*3 bytes")
    encodePngCore(width, height, 3, 2, rgb)
  }

  /** Grayscale (color type 0) PNG writer — same filter rotation and chunk
    * layout over 1-byte samples; `decodePng(encodePngGray(w, h, g))`
    * replicates each sample into all three BGR channels (spec-pinned).
    */
  def encodePngGray(width: Int, height: Int, samples: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && samples.length == width * height,
      s"samples must be $width*$height bytes")
    encodePngCore(width, height, 1, 0, samples)
  }

  private def encodePngCore(
      width: Int, height: Int, bpp: Int, colorType: Int,
      data: Array[Byte]): Array[Byte] = {
    val stride = width * bpp
    val raw = new Array[Byte]((stride + 1) * height)
    var y = 0
    while (y < height) {
      val ft = y % 5
      raw(y * (stride + 1)) = ft.toByte
      var i = 0
      while (i < stride) {
        val cur = data(y * stride + i) & 0xFF
        val left = if (i >= bpp) data(y * stride + i - bpp) & 0xFF else 0
        val up = if (y > 0) data((y - 1) * stride + i) & 0xFF else 0
        val ul = if (y > 0 && i >= bpp) data((y - 1) * stride + i - bpp) & 0xFF else 0
        val v = ft match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - ((left + up) / 2)
          case _ => cur - paeth(left, up, ul)
        }
        raw(y * (stride + 1) + 1 + i) = v.toByte
        i += 1
      }
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    val zOut = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    try {
      defl.setInput(raw); defl.finish()
      val buf = new Array[Byte](8192)
      while (!defl.finished()) zOut.write(buf, 0, defl.deflate(buf))
    } finally defl.end()
    val idat = zOut.toByteArray
    val out = new Array[Byte](8 + 25 + (12 + idat.length) + 12)
    var p = 0
    PngSig.foreach { s => out(p) = s.toByte; p += 1 }
    def chunk(typ: String, data: Array[Byte]): Unit = {
      putBe32(out, p, data.length)
      var i = 0
      while (i < 4) { out(p + 4 + i) = typ(i).toByte; i += 1 }
      System.arraycopy(data, 0, out, p + 8, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(out, p + 4, 4 + data.length)
      putBe32(out, p + 8 + data.length, crc.getValue.toInt)
      p += 12 + data.length
    }
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, width); putBe32(ihdr, 4, height)
    ihdr(8) = 8 // bit depth
    ihdr(9) = colorType.toByte // 2 = truecolor, 0 = grayscale
    // compression 0, filter 0, interlace 0 stay zero
    chunk("IHDR", ihdr)
    chunk("IDAT", idat)
    chunk("IEND", Array.emptyByteArray)
    out
  }

  /** Extended PNG writer for the legacy web-corpus forms: truecolor
    * (2) / grayscale (0) / PALETTE (3, depths 1/2/4/8), sequential or
    * ADAM7-interlaced — each pass filtered independently with the
    * rotating per-row filter (all five predictors exercised inside
    * every pass). `samples` is per-pixel row-major: 3 RGB bytes (type
    * 2), 1 gray byte (0), or 1 palette INDEX byte (3 — bit packing by
    * `depth` happens here); `plte` is the RGB palette for type 3.
    */
  private[graft] def encodePngExt(
      width: Int, height: Int, colorType: Int, depth: Int,
      interlace: Boolean, samples: Array[Byte],
      plte: Array[Byte] = null, trns: Array[Byte] = null): Array[Byte] = {
    // caller sample layout: 16-bit depths pass BIG-ENDIAN byte pairs;
    // sub-byte gray passes one LEVEL byte per pixel (packed here)
    val chans = colorType match {
      case 2 => 3; case 4 => 2; case 6 => 4; case _ => 1
    }
    val perPx = chans * (if (depth == 16) 2 else 1)
    require(samples.length == width * height * perPx)
    require(colorType != 3 || (plte != null && plte.length % 3 == 0))
    val bitsPP = chans * depth
    val bppBytes = math.max(1, bitsPP / 8)
    val passes: Array[(Int, Int, Int, Int)] =
      if (!interlace) Array((0, 0, 1, 1)) else Adam7
    val rawOut = new java.io.ByteArrayOutputStream()
    passes.foreach { case (x0, y0, dx, dy) =>
      val wP = if (width > x0) (width - x0 + dx - 1) / dx else 0
      val hP = if (height > y0) (height - y0 + dy - 1) / dy else 0
      if (wP > 0 && hP > 0) {
        val rowBytes = ((wP.toLong * bitsPP + 7) / 8).toInt
        val rows = new Array[Byte](rowBytes * hP)
        var y = 0
        while (y < hP) {
          var x = 0
          while (x < wP) {
            val src = ((y0 + y * dy) * width + (x0 + x * dx)) * perPx
            if (perPx >= 2) { // 8-bit truecolor or any 16-bit form
              var k = 0
              while (k < perPx) {
                rows(y * rowBytes + x * perPx + k) = samples(src + k)
                k += 1
              }
            } else if (depth == 8) {
              rows(y * rowBytes + x) = samples(src)
            } else {
              val bit = x * depth
              val sh = 8 - depth - (bit & 7)
              val at = y * rowBytes + (bit >> 3)
              rows(at) = (rows(at) |
                (((samples(src) & ((1 << depth) - 1)) << sh))).toByte
            }
            x += 1
          }
          y += 1
        }
        // filter each row (rotating filter — every predictor exercised)
        var fy = 0
        while (fy < hP) {
          val ft = fy % 5
          rawOut.write(ft)
          val line = new Array[Byte](rowBytes)
          var i2 = 0
          while (i2 < rowBytes) {
            val cur = rows(fy * rowBytes + i2) & 0xFF
            val left = if (i2 >= bppBytes) rows(fy * rowBytes + i2 - bppBytes) & 0xFF else 0
            val up = if (fy > 0) rows((fy - 1) * rowBytes + i2) & 0xFF else 0
            val ul = if (fy > 0 && i2 >= bppBytes)
              rows((fy - 1) * rowBytes + i2 - bppBytes) & 0xFF else 0
            line(i2) = (ft match {
              case 0 => cur
              case 1 => cur - left
              case 2 => cur - up
              case 3 => cur - ((left + up) / 2)
              case _ => cur - paeth(left, up, ul)
            }).toByte
            i2 += 1
          }
          rawOut.write(line)
          fy += 1
        }
      }
    }
    val defl = new java.util.zip.Deflater()
    val zOut = new java.io.ByteArrayOutputStream()
    try {
      defl.setInput(rawOut.toByteArray); defl.finish()
      val buf = new Array[Byte](8192)
      while (!defl.finished()) zOut.write(buf, 0, defl.deflate(buf))
    } finally defl.end()
    val out = new java.io.ByteArrayOutputStream()
    PngSig.foreach(out.write)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val hd = new Array[Byte](8)
      putBe32(hd, 0, data.length)
      var i = 0
      while (i < 4) { hd(4 + i) = typ(i).toByte; i += 1 }
      out.write(hd)
      out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(hd, 4, 4); crc.update(data)
      val tl = new Array[Byte](4)
      putBe32(tl, 0, crc.getValue.toInt)
      out.write(tl)
    }
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, width); putBe32(ihdr, 4, height)
    ihdr(8) = depth.toByte
    ihdr(9) = colorType.toByte
    ihdr(12) = if (interlace) 1 else 0
    chunk("IHDR", ihdr)
    if (colorType == 3) chunk("PLTE", plte)
    // transparency: palette alpha table / gray key / RGB key (§11.3.2)
    if (trns != null) chunk("tRNS", trns)
    chunk("IDAT", zOut.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Constant-color PNG (RGB order — note `encodeBmpConst` takes BGR). */
  def encodePngConst(width: Int, height: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val px = new Array[Byte](width * height * 3)
    var i = 0
    while (i < px.length) {
      px(i) = r.toByte; px(i + 1) = g.toByte; px(i + 2) = b.toByte
      i += 3
    }
    encodePng(width, height, px)
  }

  /** Decompressed-size cap for PNG streams — rejects zip-bomb headers
    * before allocating (64 MiB of filtered scanlines ≈ a 4k×4k truecolor
    * frame, far above any test asset and bounded per executor thread).
    */
  private val PngMaxRaw = 64L << 20

  /** Adam7 pass geometry (PNG spec §8.2): per pass the starting
    * column/row and the column/row steps.
    */
  private val Adam7: Array[(Int, Int, Int, Int)] = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** REAL PNG codec (public spec, no dependencies beyond JDK zlib):
    * signature + chunk walk (length/type/data/crc frames,
    * bounds-checked), IHDR first; supports grayscale (0) at depths
    * 1/2/4/8/16, truecolor (2) at depths 8/16, PALETTE (3, bit depths
    * 1/2/4/8), and the 8-bit alpha forms gray+alpha (4) and RGBA (6)
    * with the alpha channel dropped; 16-bit samples reduce to the
    * high byte (libpng strip-16 convention). Each form decodes
    * NON-INTERLACED or ADAM7 (interlace 1, seven sub-images with
    * their own scanline filtering, sparse passes skipped when a
    * dimension rounds to zero). Anything else (16-bit alpha forms,
    * nonstandard depth/color combinations) is `None` — the
    * `decodeBmp` error-as-value discipline. IDAT chunks concatenate into one zlib stream
    * (`Inflater`); scanlines unfilter through the five standard
    * predictors with the spec's byte-distance (`max(1, bits/8)` — for
    * sub-byte palettes "left" is the previous BYTE); output converts
    * to BGR in the shared `BmpImage` shape so every downstream image
    * operator works unchanged. CRCs are not verified — a bit-flipped
    * chunk body must degrade, never throw (corruption fuzz pins this).
    */
  def decodePng(b: Array[Byte]): Option[BmpImage] =
    decodePngWithAlpha(b).map(_._1)

  /** `decodePng` plus the TRANSPARENCY plane: alpha per pixel
    * (0..255, `null` when the stream carries no transparency at all)
    * from the alpha CHANNELS (color types 4/6) or the `tRNS` chunk —
    * palette alpha table, gray level key, or RGB color key (PNG spec
    * §11.3.2). Color stays un-composited (the q193 convention);
    * transparency is surfaced as data, not baked into pixels.
    */
  def decodePngWithAlpha(b: Array[Byte]): Option[(BmpImage, Array[Byte])] = {
    if (b == null || b.length < 8 + 25 + 12) return None
    var i = 0
    while (i < 8) { if ((b(i) & 0xFF) != PngSig(i)) return None; i += 1 }
    // chunk walk: collect IHDR + PLTE + tRNS + IDAT, stop at IEND
    var p = 8
    var w = 0; var h = 0; var ok = false
    var colorType = 0; var depth = 8; var interlace = 0
    var plte: Array[Byte] = null
    var trns: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var first = true
    while (p + 8 <= b.length) {
      val len = be32(b, p)
      if (len < 0 || p + 12L + len > b.length)
        return if (ok && idat.size > 0)
          inflatePng(w, h, colorType, depth, interlace, plte, trns,
            idat.toByteArray)
        else None
      val typ = new String(b, p + 4, 4, StandardCharsets.US_ASCII)
      if (first) {
        if (typ != "IHDR" || len != 13) return None
        w = be32(b, p + 8); h = be32(b, p + 12)
        depth = b(p + 16) & 0xFF
        colorType = b(p + 17) & 0xFF
        interlace = b(p + 20) & 0xFF
        val depthOk = colorType match {
          case 0 => Seq(1, 2, 4, 8, 16).contains(depth)
          case 2 => depth == 8 || depth == 16
          case 3 => Seq(1, 2, 4, 8).contains(depth)
          case 4 | 6 => depth == 8 // alpha forms: the modern-web norm
          case _ => false
        }
        if (w <= 0 || h <= 0 || !depthOk || interlace > 1) return None
        // hostile dims: the filtered-scanline buffer must stay bounded
        // (interlaced streams carry ≤ h extra filter bytes over the
        // sequential form — 7L*w covers every supported layout incl.
        // 16-bit truecolor's 6 bytes/px)
        if ((7L * w + 2L) * h > PngMaxRaw || 3L * w * h > Int.MaxValue)
          return None
        ok = true
        first = false
      } else typ match {
        case "IDAT" => idat.write(b, p + 8, len)
        case "PLTE" =>
          if (len % 3 != 0 || len > 768) return None
          plte = java.util.Arrays.copyOfRange(b, p + 8, p + 8 + len)
        case "tRNS" =>
          // shape per color type: alpha table (3, ≤ palette size),
          // 2-byte gray key (0), 6-byte RGB key (2); alpha-channel
          // forms must not carry one (spec) — degrade, don't throw
          val shapeOk = colorType match {
            case 3 => len <= 256
            case 0 => len == 2
            case 2 => len == 6
            case _ => false
          }
          if (shapeOk)
            trns = java.util.Arrays.copyOfRange(b, p + 8, p + 8 + len)
        case "IEND" => p = b.length // stop
        case _ => () // ancillary chunk — skipped
      }
      p += 12 + len
    }
    if (!ok || idat.size == 0) return None
    inflatePng(w, h, colorType, depth, interlace, plte, trns, idat.toByteArray)
  }

  /** Inflate, unfilter (per pass), extract samples, and place pixels;
    * the second result is the alpha plane (null when the stream has no
    * transparency source).
    */
  private def inflatePng(
      w: Int, h: Int, colorType: Int, depth: Int, interlace: Int,
      plte: Array[Byte], trns: Array[Byte],
      z: Array[Byte]): Option[(BmpImage, Array[Byte])] = {
    if (colorType == 3 && plte == null) return None
    val alpha: Array[Byte] =
      if (trns != null || colorType == 4 || colorType == 6) {
        val a = new Array[Byte](w * h)
        java.util.Arrays.fill(a, 0xFF.toByte)
        a
      } else null
    val bitsPP = colorType match {
      case 2 => 3 * depth
      case 4 => 2 * depth // gray + alpha
      case 6 => 4 * depth // truecolor + alpha
      case _ => depth
    }
    val bppBytes = math.max(1, bitsPP / 8)
    // sub-byte gray levels scale onto 0..255 exactly (255/(2^d-1) is
    // an integer for d in 1/2/4); 16-bit reduces to the HIGH byte (the
    // libpng strip-16 convention)
    val grayScale = if (depth < 8) 255 / ((1 << depth) - 1) else 1
    val passes: Array[(Int, Int, Int, Int)] =
      if (interlace == 0) Array((0, 0, 1, 1)) else Adam7
    // total filtered size across non-empty passes
    var rawLen = 0L
    passes.foreach { case (x0, y0, dx, dy) =>
      val wP = if (w > x0) (w - x0 + dx - 1) / dx else 0
      val hP = if (h > y0) (h - y0 + dy - 1) / dy else 0
      if (wP > 0 && hP > 0) rawLen += hP.toLong * (1L + (wP.toLong * bitsPP + 7) / 8)
    }
    if (rawLen > PngMaxRaw || rawLen > Int.MaxValue) return None
    val raw = new Array[Byte](rawLen.toInt)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(z)
      var off = 0
      var stalled = false
      while (off < raw.length && !inf.finished() && !stalled) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) stalled = true
        off += n
      }
      if (off < raw.length) return None // truncated/corrupt stream
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()
    val bgr = new Array[Byte](w * h * 3)
    var off = 0
    var pi = 0
    while (pi < passes.length) {
      val (x0, y0, dx, dy) = passes(pi)
      val wP = if (w > x0) (w - x0 + dx - 1) / dx else 0
      val hP = if (h > y0) (h - y0 + dy - 1) / dy else 0
      if (wP > 0 && hP > 0) {
        val rowBytes = ((wP.toLong * bitsPP + 7) / 8).toInt
        val recon = new Array[Byte](rowBytes * hP)
        var y = 0
        while (y < hP) {
          val ft = raw(off + y * (rowBytes + 1)) & 0xFF
          if (ft > 4) return None
          var i2 = 0
          while (i2 < rowBytes) {
            val x = raw(off + y * (rowBytes + 1) + 1 + i2) & 0xFF
            val left = if (i2 >= bppBytes) recon(y * rowBytes + i2 - bppBytes) & 0xFF else 0
            val up = if (y > 0) recon((y - 1) * rowBytes + i2) & 0xFF else 0
            val ul = if (y > 0 && i2 >= bppBytes)
              recon((y - 1) * rowBytes + i2 - bppBytes) & 0xFF else 0
            val v = ft match {
              case 0 => x
              case 1 => x + left
              case 2 => x + up
              case 3 => x + ((left + up) / 2)
              case _ => x + paeth(left, up, ul)
            }
            recon(y * rowBytes + i2) = v.toByte
            i2 += 1
          }
          y += 1
        }
        off += (rowBytes + 1) * hP
        // sample extraction + placement
        y = 0
        while (y < hP) {
          var x = 0
          while (x < wP) {
            val outIdx = (y0 + y * dy) * w + (x0 + x * dx)
            val outPx = outIdx * 3
            colorType match {
              case 2 if depth == 16 =>
                val s = y * rowBytes + x * 6 // high bytes of R,G,B
                bgr(outPx) = recon(s + 4)
                bgr(outPx + 1) = recon(s + 2)
                bgr(outPx + 2) = recon(s)
                // RGB color key: all three 16-bit samples must match
                if (trns != null &&
                  recon(s) == trns(0) && recon(s + 1) == trns(1) &&
                  recon(s + 2) == trns(2) && recon(s + 3) == trns(3) &&
                  recon(s + 4) == trns(4) && recon(s + 5) == trns(5))
                  alpha(outIdx) = 0
              case 2 =>
                val s = y * rowBytes + x * 3
                bgr(outPx) = recon(s + 2)
                bgr(outPx + 1) = recon(s + 1)
                bgr(outPx + 2) = recon(s)
                // 8-bit samples compare to the keys' LOW bytes (the
                // 16-bit fields must hold ≤ 255 at this depth)
                if (trns != null &&
                  recon(s) == trns(1) && recon(s + 1) == trns(3) &&
                  recon(s + 2) == trns(5))
                  alpha(outIdx) = 0
              case 0 if depth == 16 =>
                val s = y * rowBytes + x * 2
                val g = recon(s) // high byte
                bgr(outPx) = g; bgr(outPx + 1) = g; bgr(outPx + 2) = g
                if (trns != null && recon(s) == trns(0) &&
                  recon(s + 1) == trns(1))
                  alpha(outIdx) = 0
              case 0 if depth < 8 =>
                val bit = x * depth
                val by = recon(y * rowBytes + (bit >> 3)) & 0xFF
                val lvl = (by >> (8 - depth - (bit & 7))) & ((1 << depth) - 1)
                val g = (lvl * grayScale).toByte
                bgr(outPx) = g; bgr(outPx + 1) = g; bgr(outPx + 2) = g
                // the key is the RAW level, pre-scaling
                if (trns != null &&
                  lvl == (((trns(0) & 0xFF) << 8) | (trns(1) & 0xFF)))
                  alpha(outIdx) = 0
              case 0 =>
                val g = recon(y * rowBytes + x)
                bgr(outPx) = g; bgr(outPx + 1) = g; bgr(outPx + 2) = g
                if (trns != null && trns(0) == 0 && g == trns(1))
                  alpha(outIdx) = 0
              case 6 => // RGBA: color kept, alpha SURFACED not baked
                // (compositing would invent a background)
                val s = y * rowBytes + x * 4
                bgr(outPx) = recon(s + 2)
                bgr(outPx + 1) = recon(s + 1)
                bgr(outPx + 2) = recon(s)
                alpha(outIdx) = recon(s + 3)
              case 4 => // gray + alpha
                val g = recon(y * rowBytes + x * 2)
                bgr(outPx) = g; bgr(outPx + 1) = g; bgr(outPx + 2) = g
                alpha(outIdx) = recon(y * rowBytes + x * 2 + 1)
              case _ =>
                // palette index, MSB-first within the byte
                val bit = x * depth
                val by = recon(y * rowBytes + (bit >> 3)) & 0xFF
                val idx = (by >> (8 - depth - (bit & 7))) & ((1 << depth) - 1)
                if (idx * 3 + 2 >= plte.length) return None
                bgr(outPx) = plte(idx * 3 + 2)
                bgr(outPx + 1) = plte(idx * 3 + 1)
                bgr(outPx + 2) = plte(idx * 3)
                // alpha table: entries beyond it are opaque (spec)
                if (trns != null && idx < trns.length)
                  alpha(outIdx) = trns(idx)
            }
            x += 1
          }
          y += 1
        }
      }
      pi += 1
    }
    Some((BmpImage(w, h, 24, bgr), alpha))
  }

  /** General 16-bit PCM WAV writer — `encodeWavSilence`'s layout with
    * caller-provided channel-interleaved samples (the inverse of
    * `decodeWav` restricted to 16-bit: `decodeWav(encodeWavPcm16(r, ch,
    * s)).samples(i) == s(i)/32768f` exactly, since 16-bit integers are
    * exact in a float mantissa).
    */
  def encodeWavPcm16(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    val out = encodeWavSilence(sampleRate, channels, samples.length)
    var i = 0
    while (i < samples.length) {
      putLe16(out, 44 + 2 * i, samples(i) & 0xFFFF)
      i += 1
    }
    out
  }

  /** REAL WAV codec (public RIFF layout, no dependencies): 'RIFF' size
    * 'WAVE', then word-aligned chunks; `fmt ` (PCM format tag, channels,
    * sample rate, bits) and `data` (the sample bytes). Supports 8- and
    * 16-bit integer PCM; anything else — or a truncated/garbled chunk
    * walk — is `None`.
    */
  def decodeWav(b: Array[Byte]): Option[WavAudio] = {
    if (b == null || b.length < 44) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var o = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // (channels, rate, bits, tag)
    var data: Option[(Int, Int)] = None // (offset, length)
    while (o + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val id = new String(b, o, 4, StandardCharsets.US_ASCII)
      val sz = le32(b, o + 4)
      if (sz < 0 || o + 8 + sz.toLong > b.length) return None
      if (id == "fmt " && sz >= 16) {
        // integer PCM (1), IEEE float (3), A-law (6), mu-law (7) —
        // G.711 is 8-bit only, float is 32-bit only
        val tag = le16(b, o + 8)
        if (tag != 1 && tag != 3 && tag != 6 && tag != 7) return None
        fmt = Some((le16(b, o + 10), le32(b, o + 12), le16(b, o + 22), tag))
      } else if (id == "data") data = Some((o + 8, sz))
      o += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    for {
      (ch, rate, bits, tag) <- fmt
      (doff, dlen) <- data
      if ch > 0 && rate > 0 &&
        (tag match {
          case 1 => bits == 8 || bits == 16
          case 3 => bits == 32
          case _ => bits == 8
        })
    } yield {
      val n = tag match {
        case 1 if bits == 16 => dlen / 2
        case 3 => dlen / 4
        case _ => dlen
      }
      val out = new Array[Float](n)
      var i = 0
      while (i < n) {
        out(i) = tag match {
          case 1 if bits == 16 => le16(b, doff + 2 * i).toShort / 32768f
          case 1 => ((b(doff + i) & 0xFF) - 128) / 128f
          // IEEE float samples are already normalized; clamp the
          // out-of-range values sloppy writers emit
          case 3 =>
            val f = java.lang.Float.intBitsToFloat(le32(b, doff + 4 * i))
            if (f.isNaN) 0f else math.max(-1f, math.min(1f, f))
          // G.711 expansion lands on the 16-bit grid: exact dyadic floats
          case 6 => alawExpand(b(doff + i) & 0xFF) / 32768f
          case _ => mulawExpand(b(doff + i) & 0xFF) / 32768f
        }
        i += 1
      }
      WavAudio(rate, ch, bits, out)
    }
  }

  /** ITU-T G.711 μ-law expansion, byte → linear 14-bit-on-16-bit-grid
    * (the public piecewise formula: complement, 3-bit exponent, 4-bit
    * mantissa, bias 0x84): `((mant·8 + 0x84) << exp) − 0x84`, negated
    * when the complemented sign bit is set. 0xFF is +0 (μ-law has a true
    * zero); magnitudes reach ±32124.
    */
  def mulawExpand(u8: Int): Int = {
    val u = ~u8 & 0xFF
    val mag = ((((u & 0x0F) << 3) | 0x84) << ((u >> 4) & 0x07)) - 0x84
    if ((u & 0x80) != 0) -mag else mag
  }

  /** ITU-T G.711 A-law expansion (xor 0x55, segment 0 linear, segments
    * 1–7 exponential): no true zero (quietest codes are ±8); magnitudes
    * reach ±32256. Sign bit SET means positive — A-law's inverted-sign
    * convention.
    */
  def alawExpand(u8: Int): Int = {
    val a = u8 ^ 0x55
    val m = a & 0x0F
    val seg = (a >> 4) & 0x07
    val t = if (seg == 0) (m << 4) + 8 else ((m << 4) + 0x108) << (seg - 1)
    if ((a & 0x80) != 0) t else -t
  }

  /** G.711 WAV writer: the canonical 44-byte layout with format tag 7
    * (μ-law) or 6 (A-law), 8 bits per sample, caller-provided companded
    * bytes — the inverse of `decodeWav`'s G.711 arm.
    */
  def encodeWavG711(
      sampleRate: Int, channels: Int, companded: Array[Byte],
      aLaw: Boolean): Array[Byte] = {
    require(sampleRate > 0 && channels > 0)
    val out = new Array[Byte](44 + companded.length)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putLe32(out, 4, 36 + companded.length)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    putLe32(out, 16, 16)
    putLe16(out, 20, if (aLaw) 6 else 7)
    putLe16(out, 22, channels)
    putLe32(out, 24, sampleRate)
    putLe32(out, 28, sampleRate * channels) // byte rate: 1 byte/sample
    putLe16(out, 32, channels) // block align
    putLe16(out, 34, 8)
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    putLe32(out, 40, companded.length)
    System.arraycopy(companded, 0, out, 44, companded.length)
    out
  }

  /** Decoded uncompressed video: `frames` are BGR row-major TOP-DOWN pixel
    * grids (the same layout as `BmpImage.pixels`), one per stored frame.
    */
  final case class AviVideo(width: Int, height: Int, frames: Array[Array[Byte]])

  /** AVI writer — the inverse of `decodeAvi` for uncompressed 24-bpp DIB
    * video: `RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf))
    * LIST('movi' 00db…))`, each frame stored like BMP pixel data
    * (bottom-up rows padded to 4 bytes). `frames` are BGR row-major
    * TOP-DOWN, `width*height*3` bytes each.
    */
  def encodeAvi(width: Int, height: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && frames.nonEmpty &&
      frames.forall(_.length == width * height * 3),
      s"frames must each be $width*$height*3 BGR bytes")
    val rowSize = ((24 * width + 31) / 32) * 4
    val frameLen = rowSize * height // multiple of 4: no odd-chunk padding
    val strlSize = 4 + (8 + 56) + (8 + 40) // 'strl' + strh + strf
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize) // 'hdrl' + avih + LIST strl
    val moviSize = 4 + frames.length * (8 + frameLen)
    val total = 12 + (8 + hdrlSize) + (8 + moviSize)
    val out = new Array[Byte](total)
    var p = 0
    def fourcc(s: String): Unit = { var i = 0; while (i < 4) { out(p + i) = s(i).toByte; i += 1 }; p += 4 }
    def u32(v: Int): Unit = { putLe32(out, p, v); p += 4 }
    def u16(v: Int): Unit = { putLe16(out, p, v); p += 2 }
    fourcc("RIFF"); u32(total - 8); fourcc("AVI ")
    fourcc("LIST"); u32(hdrlSize); fourcc("hdrl")
    // avih: 25 fps nominal; frame count, dims — the decoder's cross-check
    fourcc("avih"); u32(56)
    u32(40000); u32(frameLen * 25); u32(0); u32(0)
    u32(frames.length); u32(0); u32(1); u32(frameLen)
    u32(width); u32(height); u32(0); u32(0); u32(0); u32(0)
    fourcc("LIST"); u32(strlSize); fourcc("strl")
    fourcc("strh"); u32(56)
    fourcc("vids"); fourcc("DIB "); u32(0); u16(0); u16(0)
    u32(0); u32(1); u32(25); u32(0); u32(frames.length)
    u32(frameLen); u32(0); u32(0)
    u16(0); u16(0); u16(width); u16(height) // rcFrame
    // strf: a verbatim BITMAPINFOHEADER — the stream's authoritative shape
    fourcc("strf"); u32(40)
    u32(40); u32(width); u32(height); u16(1); u16(24)
    u32(0); u32(frameLen); u32(0); u32(0); u32(0); u32(0)
    fourcc("LIST"); u32(moviSize); fourcc("movi")
    for (f <- frames) {
      fourcc("00db"); u32(frameLen)
      var r = 0
      while (r < height) {
        System.arraycopy(f, (height - 1 - r) * width * 3, out, p + r * rowSize, width * 3)
        r += 1
      }
      p += frameLen
    }
    assert(p == total, s"AVI writer layout drift: wrote $p of $total")
    out
  }

  /** Constant-color-per-frame AVI: frame `f` is a solid `colors(f)` (b, g,
    * r) fill — per-frame channel means decode back EXACTLY, which is what
    * makes q48 oracle-checkable (q43's constant-fill argument per frame).
    */
  def encodeAviConst(width: Int, height: Int, colors: Seq[(Int, Int, Int)]): Array[Byte] =
    encodeAvi(width, height, colors.map { case (b, g, r) =>
      val px = new Array[Byte](width * height * 3)
      var i = 0
      while (i < px.length) {
        px(i) = b.toByte; px(i + 1) = g.toByte; px(i + 2) = r.toByte
        i += 3
      }
      px
    })

  /** REAL AVI codec (public RIFF layout, no dependencies): the same
    * word-aligned chunk walk as `decodeWav`, one level deeper — `LIST`
    * chunks (`hdrl`/`strl`/`movi`) are descended into, the stream's
    * `strf` BITMAPINFOHEADER fixes the pixel shape (same field layout as
    * BMP's info header), and each `00db`/`00dc` chunk is one bottom-up
    * padded DIB frame, unflipped to top-down BGR exactly as `decodeBmp`
    * does. Supports the uncompressed 24-bpp form AND the 8-bit MS-RLE8
    * compressed form (`biCompression=1`, palette-indexed — the classic
    * compressed AVI variant, decoded run-by-run then palette-mapped to
    * the same top-down BGR); anything else — or a truncated/garbled walk,
    * a frame whose size disagrees with the declared shape, an RLE stream
    * that runs off a row or the buffer, or a pixel index past the
    * palette — is `None` (the D15 error-as-value discipline).
    * Header-derived sizes go through Long arithmetic for the same
    * hostile-header reasons spelled out in `decodeBmp`.
    */
  def decodeAvi(b: Array[Byte]): Option[AviVideo] = {
    if (b == null || b.length < 24) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' ')) return None
    var w = 0; var h = 0; var bpp = -1; var comp = -1
    var palette: Array[Byte] = null // RGBQUAD entries (b, g, r, _) * nColors
    val frameChunks = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    def walk(start: Int, end: Int, depth: Int): Boolean = {
      var o = start
      while (o + 8 <= end) {
        val id = new String(b, o, 4, StandardCharsets.US_ASCII)
        val sz = le32(b, o + 4)
        if (sz < 0 || o + 8 + sz.toLong > end) return false
        if (id == "LIST") {
          if (sz < 4 || depth >= 4) return false
          val lt = new String(b, o + 8, 4, StandardCharsets.US_ASCII)
          if (lt == "hdrl" || lt == "strl" || lt == "movi")
            if (!walk(o + 12, o + 8 + sz, depth + 1)) return false
        } else if (id == "strf" && sz >= 40) {
          w = le32(b, o + 8 + 4)
          h = le32(b, o + 8 + 8)
          bpp = le16(b, o + 8 + 14)
          comp = le32(b, o + 8 + 16)
          // 8-bpp streams carry their palette right after the info header;
          // biClrUsed=0 means the full 256 (the BMP convention)
          if (bpp == 8) {
            val clrUsed = le32(b, o + 8 + 32)
            val n = if (clrUsed == 0) 256 else clrUsed
            if (n < 0 || n > 256 || sz < 40 + 4L * n) return false
            palette = java.util.Arrays.copyOfRange(b, o + 8 + 40, o + 8 + 40 + 4 * n)
          }
        } else if (id.length == 4 && (id.endsWith("db") || id.endsWith("dc"))) {
          frameChunks += ((o + 8, sz))
        }
        o += 8 + sz + (sz & 1)
      }
      true
    }
    if (!walk(12, b.length, 0)) return None
    if (w <= 0 || h == 0 || frameChunks.isEmpty) return None
    val topDown = h < 0
    val ah = math.abs(h.toLong)
    if (w.toLong * ah * 3L > Int.MaxValue) return None
    if (bpp == 24 && comp == 0) {
      val rowSize = ((24L * w + 31L) / 32L) * 4L
      if (rowSize * ah > Int.MaxValue) return None
      val frameLen = (rowSize * ah).toInt
      if (!frameChunks.forall(_._2 == frameLen)) return None
      val frames = frameChunks.map { case (off, _) =>
        val px = new Array[Byte]((w * ah * 3L).toInt)
        var r = 0
        while (r < ah) {
          val srcRow = if (topDown) r else ah - 1 - r
          System.arraycopy(b, off + (srcRow * rowSize).toInt, px, (r.toLong * w * 3L).toInt, w * 3)
          r += 1
        }
        px
      }
      Some(AviVideo(w, ah.toInt, frames.toArray))
    } else if (bpp == 8 && comp == 1 && palette != null && !topDown) {
      // MS-RLE8 is defined bottom-up only (a negative height is invalid)
      val nColors = palette.length / 4
      val frames = new Array[Array[Byte]](frameChunks.length)
      var fi = 0
      while (fi < frameChunks.length) {
        val (off, sz) = frameChunks(fi)
        val idx = decodeRle8Frame(b, off, sz, w, ah.toInt).getOrElse(return None)
        val px = new Array[Byte]((w * ah * 3L).toInt)
        var i = 0
        while (i < idx.length) {
          val v = idx(i) & 0xFF
          if (v >= nColors) return None
          px(i * 3) = palette(v * 4)
          px(i * 3 + 1) = palette(v * 4 + 1)
          px(i * 3 + 2) = palette(v * 4 + 2)
          i += 1
        }
        frames(fi) = px
        fi += 1
      }
      Some(AviVideo(w, ah.toInt, frames))
    } else None
  }

  /** One MS-RLE8 frame → top-down row-major palette indices, or `None` on
    * any malformed stream (truncated pair, run past the row end, absolute
    * block past the buffer, delta past the grid, missing end-of-bitmap).
    * The four escapes are the documented public format: `(0,0)` end of
    * line, `(0,1)` end of bitmap, `(0,2)` + (dx, dy) position delta
    * (skipped cells keep index 0), `(0,n≥3)` absolute run of n literal
    * indices padded to a word boundary; `(c>0, v)` is a run of c copies
    * of v. Rows are stored bottom-up; the unflip happens on write.
    */
  private[operators] def decodeRle8Frame(
      b: Array[Byte], off: Int, sz: Int, w: Int, h: Int): Option[Array[Byte]] = {
    val idx = new Array[Byte](w * h)
    val end = off.toLong + sz
    var p = off
    var x = 0
    var y = 0 // bottom-up row cursor
    while (true) {
      if (p + 2 > end) return None
      val c = b(p) & 0xFF
      val v = b(p + 1) & 0xFF
      p += 2
      if (c > 0) {
        if (y >= h || x + c > w) return None
        val row = h - 1 - y
        java.util.Arrays.fill(idx, row * w + x, row * w + x + c, v.toByte)
        x += c
      } else v match {
        case 0 =>
          y += 1; x = 0
          if (y > h) return None
        case 1 =>
          return Some(idx)
        case 2 =>
          if (p + 2 > end) return None
          x += b(p) & 0xFF
          y += b(p + 1) & 0xFF
          p += 2
          if (x > w || y > h) return None
        case n =>
          if (y >= h || x + n > w) return None
          if (p + n > end) return None
          val row = h - 1 - y
          var i = 0
          while (i < n) { idx(row * w + x + i) = b(p + i); i += 1 }
          x += n
          p += n + (n & 1)
      }
    }
    None // unreachable: the loop exits via EOB or an error return
  }

  /** MS-RLE8 AVI writer — the inverse of `decodeAvi`'s compressed branch:
    * same container skeleton as `encodeAvi` but an 8-bpp palette-indexed
    * stream (`biCompression=1`, 256 RGBQUAD entries riding in strf) whose
    * `00dc` chunks hold run-length-encoded bottom-up rows (maximal runs
    * capped at 255, end-of-line after every row, end-of-bitmap closing
    * the frame). `frames` are palette INDICES, row-major TOP-DOWN,
    * `width*height` bytes each; `palette` is 256 (b, g, r) entries.
    * Round-trips through `decodeAvi` pixel-exactly (spec-pinned).
    */
  def encodeAviRle8(width: Int, height: Int, palette: Array[(Int, Int, Int)],
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && frames.nonEmpty &&
      frames.forall(_.length == width * height),
      s"frames must each be $width*$height palette indices")
    require(palette.length == 256, "palette must have 256 entries")
    val enc = frames.map { f =>
      val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
      var y = 0
      while (y < height) {
        val row = (height - 1 - y) * width // bottom-up storage order
        var x = 0
        while (x < width) {
          val v = f(row + x)
          var run = 1
          while (x + run < width && f(row + x + run) == v && run < 255) run += 1
          out += run.toByte += v
          x += run
        }
        out += 0 += 0 // end of line
        y += 1
      }
      out += 0 += 1 // end of bitmap
      out.toArray
    }
    val strfSize = 40 + 256 * 4
    val strlSize = 4 + (8 + 56) + (8 + strfSize)
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
    val moviSize = 4 + enc.map(e => 8 + e.length + (e.length & 1)).sum
    val total = 12 + (8 + hdrlSize) + (8 + moviSize)
    val maxFrame = enc.map(_.length).max
    val out = new Array[Byte](total)
    var p = 0
    def fourcc(s: String): Unit = { var i = 0; while (i < 4) { out(p + i) = s(i).toByte; i += 1 }; p += 4 }
    def u32(v: Int): Unit = { putLe32(out, p, v); p += 4 }
    def u16(v: Int): Unit = { putLe16(out, p, v); p += 2 }
    fourcc("RIFF"); u32(total - 8); fourcc("AVI ")
    fourcc("LIST"); u32(hdrlSize); fourcc("hdrl")
    fourcc("avih"); u32(56)
    u32(40000); u32(maxFrame * 25); u32(0); u32(0)
    u32(frames.length); u32(0); u32(1); u32(maxFrame)
    u32(width); u32(height); u32(0); u32(0); u32(0); u32(0)
    fourcc("LIST"); u32(strlSize); fourcc("strl")
    fourcc("strh"); u32(56)
    fourcc("vids"); fourcc("MRLE"); u32(0); u16(0); u16(0)
    u32(0); u32(1); u32(25); u32(0); u32(frames.length)
    u32(maxFrame); u32(0); u32(0)
    u16(0); u16(0); u16(width); u16(height)
    fourcc("strf"); u32(strfSize)
    u32(40); u32(width); u32(height); u16(1); u16(8)
    u32(1) // biCompression = BI_RLE8
    u32(maxFrame); u32(0); u32(0); u32(256); u32(0)
    for ((b, g, r) <- palette) {
      out(p) = b.toByte; out(p + 1) = g.toByte; out(p + 2) = r.toByte
      p += 4 // reserved byte stays 0
    }
    fourcc("LIST"); u32(moviSize); fourcc("movi")
    for (e <- enc) {
      fourcc("00dc"); u32(e.length)
      System.arraycopy(e, 0, out, p, e.length)
      p += e.length + (e.length & 1) // RIFF word alignment
    }
    assert(p == total, s"RLE8 AVI writer layout drift: wrote $p of $total")
    out
  }

  /** The engine's ARITHMETIC palette — entry `i` is `(i, (i*7)%256,
    * (i*13)%256)`, the same channel conventions as the constant-fill
    * fixtures, so a palette-mapped mean is pure arithmetic on the index.
    */
  def rle8ArithmeticPalette: Array[(Int, Int, Int)] =
    Array.tabulate(256)(i => (i, (i * 7) % 256, (i * 13) % 256))

  /** Constant-index-per-frame RLE8 AVI over the arithmetic palette: frame
    * `f` is a solid fill of palette index `indices(f)` — per-frame channel
    * means decode back EXACTLY as palette arithmetic, which is what makes
    * q53 oracle-checkable (q48's argument through the compressed path).
    */
  def encodeAviRle8Const(width: Int, height: Int, indices: Seq[Int]): Array[Byte] =
    encodeAviRle8(width, height, rle8ArithmeticPalette,
      indices.map(v => Array.fill[Byte](width * height)(v.toByte)))

  /** Fallback features for non-media payloads: 16-bin normalized byte
    * histogram (the original deterministic pseudo-decode).
    */
  private def byteHistogram(payload: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](16)
    if (payload == null || payload.isEmpty) bins
    else {
      payload.foreach(b => bins((b & 0xFF) / 16) += 1f)
      val n = payload.length.toFloat
      bins.map(_ / n)
    }
  }

  private def imageFeatures(img: BmpImage): Array[Float] = {
    val out = new Array[Float](16)
    out(0) = img.width.toFloat
    out(1) = img.height.toFloat
    val n = img.width * img.height
    var sb = 0L; var sg = 0L; var sr = 0L
    var i = 0
    while (i < n * 3) {
      sb += img.pixels(i) & 0xFF
      sg += img.pixels(i + 1) & 0xFF
      sr += img.pixels(i + 2) & 0xFF
      i += 3
    }
    out(2) = sb.toFloat / n / 255f
    out(3) = sg.toFloat / n / 255f
    out(4) = sr.toFloat / n / 255f
    i = 0
    while (i < n * 3) {
      val gray = ((img.pixels(i) & 0xFF) + (img.pixels(i + 1) & 0xFF) +
        (img.pixels(i + 2) & 0xFF)) / 3
      out(5 + math.min(10, gray * 11 / 256)) += 1f
      i += 3
    }
    var j = 5
    while (j < 16) { out(j) /= n; j += 1 }
    out
  }

  private def audioFeatures(a: WavAudio): Array[Float] = {
    val out = new Array[Float](16)
    out(0) = a.sampleRate.toFloat
    out(1) = a.channels.toFloat
    out(2) = a.samples.length.toFloat
    val n = math.max(1, a.samples.length)
    var sq = 0.0
    var zc = 0
    var i = 0
    while (i < a.samples.length) {
      val s = a.samples(i)
      sq += s.toDouble * s
      if (i > 0 && (s >= 0f) != (a.samples(i - 1) >= 0f)) zc += 1
      out(5 + math.min(10, ((s + 1f) / 2f * 11).toInt)) += 1f
      i += 1
    }
    out(3) = math.sqrt(sq / n).toFloat
    out(4) = zc.toFloat
    var j = 5
    while (j < 16) { out(j) /= n; j += 1 }
    out
  }

  private def videoFeatures(v: AviVideo): Array[Float] = {
    val out = new Array[Float](16)
    out(0) = v.width.toFloat
    out(1) = v.height.toFloat
    out(2) = v.frames.length.toFloat
    val nPx = v.width.toLong * v.height * v.frames.length
    var sb = 0L; var sg = 0L; var sr = 0L
    for (f <- v.frames) {
      var i = 0
      while (i < f.length) {
        sb += f(i) & 0xFF
        sg += f(i + 1) & 0xFF
        sr += f(i + 2) & 0xFF
        val gray = ((f(i) & 0xFF) + (f(i + 1) & 0xFF) + (f(i + 2) & 0xFF)) / 3
        out(6 + math.min(9, gray * 10 / 256)) += 1f
        i += 3
      }
    }
    out(3) = sb.toFloat / nPx / 255f
    out(4) = sg.toFloat / nPx / 255f
    out(5) = sr.toFloat / nPx / 255f
    var j = 6
    while (j < 16) { out(j) /= nPx; j += 1 }
    out
  }

  /** Content features, 16 floats for every modality (uniform schema so the
    * feature column composes with SimilarityOps regardless of media type):
    *  - BMP:  [width, height, meanB, meanG, meanR] ++ 11-bin gray histogram
    *  - WAV:  [rate, channels, nSamples, rms, zeroCrossings] ++ 11-bin
    *    amplitude histogram
    *  - AVI:  [width, height, nFrames, meanB, meanG, meanR] ++ 10-bin gray
    *    histogram over all frames
    *  - else: the 16-bin byte histogram fallback.
    * Dispatch is by magic bytes (BMP 'BM', WAV 'RIFF…WAVE', AVI
    * 'RIFF…AVI ' — mutually exclusive); parse failures fall through — one
    * garbled asset degrades to fallback features instead of failing the
    * batch.
    */
  private[operators] def decodeBytes(payload: Array[Byte]): Array[Float] =
    // belt-and-suspenders: the parsers return None on everything the
    // bounds checks anticipate, and the catch guarantees the never-throw
    // contract even for a shape they did not — one garbled asset must
    // never kill a partition. PNG, baseline JPEG and GIF decode into the
    // same BmpImage shape, so they share the image feature path (magic
    // bytes are disjoint: 0x89'PNG' vs 'BM' vs 0xFFD8 vs 'GIF8' vs 'RIFF').
    try decodeBmp(payload).map(imageFeatures)
      .orElse(decodePng(payload).map(imageFeatures))
      .orElse(Jpeg.decodeJpeg(payload).map(imageFeatures))
      .orElse(Gif.decodeGif(payload).map(imageFeatures))
      .orElse(Webp.decodeWebp(payload).map(imageFeatures))
      .orElse(decodeWav(payload).map(audioFeatures))
      .orElse(decodeAvi(payload).map(videoFeatures))
      .getOrElse(byteHistogram(payload))
    catch { case scala.util.control.NonFatal(_) => byteHistogram(payload) }

  /** Feature extraction over the binary column: per-partition batched
    * iteration (the Scala analog of a batched pandas-UDF pipeline — one
    * codec instance per partition, streaming rows through it, never
    * collecting to the driver).
    */
  def extractFeatures(spark: SparkSession, assetDf: DataFrame): Dataset[FeatureRow] = {
    import spark.implicits._
    assetDf.select(col("asset_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // real codecs initialize per-partition here (expensive setup once)
        it.map { case (id, mt, payload) => FeatureRow(id, mt, decodeBytes(payload)) }
      }
  }

  /** Nearest-neighbor resample of a decoded BMP — the standard index map
    * `src = floor(dst * srcDim / dstDim)`, 3 bytes per pixel copied.
    */
  private[operators] def resampleNearest(
      img: BmpImage, newWidth: Int, newHeight: Int): Array[Byte] = {
    val out = new Array[Byte](newWidth * newHeight * 3)
    var y = 0
    while (y < newHeight) {
      val sy = (y.toLong * img.height / newHeight).toInt
      var x = 0
      while (x < newWidth) {
        val sx = (x.toLong * img.width / newWidth).toInt
        System.arraycopy(img.pixels, (sy * img.width + sx) * 3, out, (y * newWidth + x) * 3, 3)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Bilinear resample of a decoded BMP — half-pixel-center source mapping
    * (`src = (dst + 0.5) * srcDim/dstDim - 0.5`, the convention every real
    * image library uses) computed in EXACT fixed-point integer arithmetic:
    * the source position lives in units of `1/(2*dstDim)` (`t = (2*dst+1)*
    * srcDim - dstDim`, clamped at 0), so the four corner weights are exact
    * integers and the output byte is a single floor division by
    * `(2*dstW)*(2*dstH)`. Fixed-point is how production codecs do this
    * (float weights differ across platforms); here it additionally makes
    * the kernel ORACLE-REPLAYABLE — every output byte is pure integer
    * arithmetic on (source pixels, coordinates), which is what lets q51
    * hash-check the whole loop in DuckDB. Edge rule: a source index at or
    * past the last row/column clamps with fraction 0 (border replication).
    */
  private[operators] def resampleBilinear(
      img: BmpImage, newWidth: Int, newHeight: Int): Array[Byte] = {
    val dx = 2L * newWidth
    val dy = 2L * newHeight
    val out = new Array[Byte](newWidth * newHeight * 3)
    var y = 0
    while (y < newHeight) {
      val ty = math.max((2L * y + 1) * img.height - newHeight, 0L)
      val sy0raw = (ty / dy).toInt
      val sy0 = math.min(sy0raw, img.height - 1)
      val fy = if (sy0raw >= img.height - 1) 0L else ty - sy0raw * dy
      val sy1 = math.min(sy0 + 1, img.height - 1)
      var x = 0
      while (x < newWidth) {
        val tx = math.max((2L * x + 1) * img.width - newWidth, 0L)
        val sx0raw = (tx / dx).toInt
        val sx0 = math.min(sx0raw, img.width - 1)
        val fx = if (sx0raw >= img.width - 1) 0L else tx - sx0raw * dx
        val sx1 = math.min(sx0 + 1, img.width - 1)
        var c = 0
        while (c < 3) {
          val p00 = img.pixels((sy0 * img.width + sx0) * 3 + c) & 0xFF
          val p10 = img.pixels((sy0 * img.width + sx1) * 3 + c) & 0xFF
          val p01 = img.pixels((sy1 * img.width + sx0) * 3 + c) & 0xFF
          val p11 = img.pixels((sy1 * img.width + sx1) * 3 + c) & 0xFF
          val v = (p00 * (dx - fx) * (dy - fy) + p10 * fx * (dy - fy) +
            p01 * (dx - fx) * fy + p11 * fx * fy) / (dx * dy)
          out((y * newWidth + x) * 3 + c) = v.toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    out
  }

  /** Nearest-neighbor resample of decoded PCM audio to `outRate` — the
    * audio analog of `resampleNearest`: output frame `j` copies all
    * channels of input frame `floor(j * inRate / outRate)`, and the
    * output length is `floor(inFrames * outRate / inRate)` frames
    * (duration-preserving under integer arithmetic — both maps are pure
    * Long expressions an oracle can replay). NN is the honest
    * dependency-free kernel here for the same reason it is for images;
    * a band-limited (windowed-sinc) kernel is the quality upgrade and
    * slots into this exact shape.
    */
  private[operators] def resampleWav(a: WavAudio, outRate: Int): WavAudio = {
    require(outRate > 0, "target rate must be positive")
    val inFrames = a.samples.length / a.channels
    val outFrames = (inFrames.toLong * outRate / a.sampleRate).toInt
    val out = new Array[Float](outFrames * a.channels)
    var j = 0
    while (j < outFrames) {
      val src = (j.toLong * a.sampleRate / outRate).toInt
      var ch = 0
      while (ch < a.channels) {
        out(j * a.channels + ch) = a.samples(src * a.channels + ch)
        ch += 1
      }
      j += 1
    }
    WavAudio(outRate, a.channels, a.bitsPerSample, out)
  }

  /** Linear-interpolation resample of decoded PCM audio to `outRate` —
    * the audio analog of `resampleBilinear`, and like it computed in EXACT
    * integer arithmetic so q52 can replay every output sample: output
    * frame `j` sits at source position `j*inRate/outRate` (same map as the
    * NN kernel, so the two kernels' output lengths agree), interpolated
    * between the two neighboring frames with the exact rational fraction
    * `(j*inRate) % outRate / outRate`. The lerp runs on the UNSIGNED
    * 16-bit domain (`v + 32768`) so the single floor division is over a
    * non-negative numerator — Scala's `/` truncates toward zero while
    * SQL's `//` floors, and biasing makes the two agree (the lerp is
    * affine, so the bias cancels exactly). Floats round-trip 16-bit
    * integers losslessly, so decoding, resampling in int space and
    * re-normalizing loses nothing.
    */
  private[operators] def resampleWavLinear(a: WavAudio, outRate: Int): WavAudio = {
    require(outRate > 0, "target rate must be positive")
    val inFrames = a.samples.length / a.channels
    val outFrames = (inFrames.toLong * outRate / a.sampleRate).toInt
    val out = new Array[Float](outFrames * a.channels)
    var j = 0
    while (j < outFrames) {
      val pos = j.toLong * a.sampleRate // in units of 1/outRate
      val s0 = (pos / outRate).toInt
      val f = pos % outRate
      val s1 = math.min(s0 + 1, inFrames - 1)
      var ch = 0
      while (ch < a.channels) {
        val u0 = math.round(a.samples(s0 * a.channels + ch) * 32768f).toLong + 32768L
        val u1 = math.round(a.samples(s1 * a.channels + ch) * 32768f).toLong + 32768L
        val u = (u0 * (outRate - f) + u1 * f) / outRate
        out(j * a.channels + ch) = (u - 32768L) / 32768f
        ch += 1
      }
      j += 1
    }
    WavAudio(outRate, a.channels, a.bitsPerSample, out)
  }

  /** Windowed-sinc (Hann) resample — the band-limited QUALITY kernel the
    * NN/linear scaladocs promise. Per output frame it evaluates a
    * `2*HalfTaps`-tap Hann-windowed sinc centered on the exact rational
    * source position, with the sinc scaled by `min(1, outRate/inRate)` on
    * downsampling so the kernel doubles as the anti-alias low-pass (the
    * standard polyphase construction). Float math — transcendentals are
    * NOT oracle-replayable cross-engine, so this kernel's correctness gate
    * is a ScalaTest property (a pure tone below the output Nyquist must
    * reconstruct with far lower error than the linear kernel leaves),
    * while q52 pins the integer-exact linear kernel. Weights are
    * normalized to sum 1 per output frame, so DC is preserved exactly and
    * truncated edge windows don't dim the signal.
    */
  private[operators] def resampleWavSinc(
      a: WavAudio, outRate: Int, halfTaps: Int = 16): WavAudio = {
    require(outRate > 0, "target rate must be positive")
    val inFrames = a.samples.length / a.channels
    val outFrames = (inFrames.toLong * outRate / a.sampleRate).toInt
    val out = new Array[Float](outFrames * a.channels)
    // cutoff scale: <1 when downsampling (anti-alias), 1 when upsampling
    val scale = math.min(1.0, outRate.toDouble / a.sampleRate)
    val radius = math.ceil(halfTaps / scale).toInt
    var j = 0
    while (j < outFrames) {
      val center = j.toDouble * a.sampleRate / outRate
      val lo = math.max(0, math.ceil(center - radius).toInt)
      val hi = math.min(inFrames - 1, math.floor(center + radius).toInt)
      var wSum = 0.0
      val acc = new Array[Double](a.channels)
      var i = lo
      while (i <= hi) {
        val t = (i - center) * scale
        val w =
          if (math.abs(t) < 1e-12) 1.0
          else if (math.abs(t) >= halfTaps) 0.0
          else {
            val pt = math.Pi * t
            (math.sin(pt) / pt) * (0.5 + 0.5 * math.cos(pt / halfTaps))
          }
        if (w != 0.0) {
          wSum += w
          var ch = 0
          while (ch < a.channels) {
            acc(ch) += w * a.samples(i * a.channels + ch)
            ch += 1
          }
        }
        i += 1
      }
      var ch = 0
      while (ch < a.channels) {
        out(j * a.channels + ch) =
          if (wSum == 0.0) 0f else (acc(ch) / wSum).toFloat
        ch += 1
      }
      j += 1
    }
    WavAudio(outRate, a.channels, a.bitsPerSample, out)
  }

  /** Resize over the asset table: decodable BMP payloads get a REAL
    * nearest-neighbor resample and are re-encoded as BMP; everything else
    * (audio, video, text stand-ins) keeps the metadata-plus-proportional-
    * truncation behavior — a non-image payload has no pixel grid to
    * resample, but the byte budget should still track the metadata shrink.
    * Plan shape: one narrow mapPartitions over the asset columns, no
    * shuffle — the same shape the stub ran in, now with a real kernel.
    * `kernel` picks the pixel map: "nearest" (the q46 default) or
    * "bilinear" (fixed-point, q51) — validated on the driver so a typo
    * fails at plan time, not per-row on an executor.
    */
  def resize(assetDf: DataFrame, newWidth: Int, newHeight: Int,
      kernel: String = "nearest"): DataFrame = {
    require(newWidth > 0 && newHeight > 0, "resize target must be positive")
    require(kernel == "nearest" || kernel == "bilinear",
      s"unknown resize kernel '$kernel' (nearest|bilinear)")
    val bilinear = kernel == "bilinear"
    val spark = assetDf.sparkSession
    import spark.implicits._
    assetDf
      .select(col("asset_id"), col("media_type"), col("payload"),
        col("width"), col("height"), col("format"))
      .as[AssetRow]
      .mapPartitions { it =>
        it.map { a =>
          decodeBmp(a.payload) match {
            case Some(img) =>
              a.copy(
                payload = encodeBmp(newWidth, newHeight,
                  if (bilinear) resampleBilinear(img, newWidth, newHeight)
                  else resampleNearest(img, newWidth, newHeight)),
                width = newWidth, height = newHeight)
            case None =>
              val ratio = (newWidth.toLong * newHeight).toDouble /
                (a.width.toLong * a.height)
              val n = math.max(1, math.min(a.payload.length,
                math.ceil(a.payload.length * ratio).toLong).toInt)
              a.copy(payload = java.util.Arrays.copyOf(a.payload, n),
                width = newWidth, height = newHeight)
          }
        }
      }
      .toDF()
  }

  /** Audio resample over an asset table — the audio counterpart of
    * `resize`, same plan shape (one narrow mapPartitions, no shuffle) and
    * same error-as-value posture: decodable WAV payloads are resampled to
    * `outRate` and re-encoded as 16-bit PCM; everything else passes
    * through UNCHANGED (a non-audio payload has no time axis — unlike
    * resize's byte-budget contract there is no meaningful "proportional"
    * fallback for audio, and silently truncating would corrupt media of
    * other types). `kernel` picks "nearest" (q50's integer map),
    * "linear" (q52's exact lerp) or "sinc" (the band-limited quality
    * kernel); validated on the driver.
    */
  def resampleAudio(assetDf: DataFrame, outRate: Int,
      kernel: String = "linear"): DataFrame = {
    require(outRate > 0, "target rate must be positive")
    require(kernel == "nearest" || kernel == "linear" || kernel == "sinc",
      s"unknown audio resample kernel '$kernel' (nearest|linear|sinc)")
    val spark = assetDf.sparkSession
    import spark.implicits._
    assetDf.select(col("asset_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, mt, payload) =>
          val out = decodeWav(payload) match {
            case Some(a) =>
              val res = kernel match {
                case "nearest" => resampleWav(a, outRate)
                case "linear"  => resampleWavLinear(a, outRate)
                case _         => resampleWavSinc(a, outRate)
              }
              encodeWavPcm16(res.sampleRate, res.channels,
                res.samples.map(f => math.max(-32768, math.min(32767,
                  math.round(f * 32768f))).toShort))
            case None => payload
          }
          (id, mt, out)
        }
      }
      .toDF("asset_id", "media_type", "payload")
  }

  /** Derive a video asset table whose payloads are REAL uncompressed-AVI
    * container bytes: the `doc_id % 3 == 2` third of the corpus that
    * `decodableAssets` leaves out, each a small constant-color-per-frame
    * video whose every header and content parameter is pure arithmetic on
    * `doc_id` (and frame index), so an independent oracle recomputes every
    * decoded value without owning the codec — the q43 argument extended to
    * the third modality.
    */
  def decodableVideos(spark: SparkSession, dir: String): Dataset[DecodableAsset] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"))
      .where(col("doc_id") % 3 === 2)
      .repartition(col("doc_id"))
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val nFrames = (2 + id % 4).toInt
          DecodableAsset(id, "video", encodeAviConst(
            (8 + id % 8).toInt, (6 + (id * 3) % 8).toInt,
            (0 until nFrames).map(f => (
              ((id + 11 * f) % 256).toInt,
              ((id * 7 + 17 * f) % 256).toInt,
              ((id * 13 + 23 * f) % 256).toInt))))
        }
      }
  }

  final case class FrameFeatureRow(
      asset_id: Long, frame_idx: Long, width: Long, height: Long,
      n_frames: Long, mean_b: Long, mean_g: Long, mean_r: Long)

  /** VIDEO NEAR-DUP corpus with PLANTED shared segments: the
    * `doc_id % 3 == 2` slice as 8-frame constant-fill AVIs where the
    * FIRST FIVE frames' fills derive from the video's GROUP
    * (`doc_id − doc_id % 21` — seven videos per group at stride 3) and
    * the last three from the video itself — so same-group videos share
    * a 5-frame segment (re-used intro/stock footage, the content-ID
    * case) while differing elsewhere, and every frame mean stays pure
    * (doc_id, frame) arithmetic for the oracle.
    */
  def nearDupVideos(spark: SparkSession, dir: String): Dataset[DecodableAsset] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"))
      .where(col("doc_id") % 3 === 2)
      .repartition(col("doc_id"))
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val grp = id - id % 21
          DecodableAsset(id, "video", encodeAviConst(
            (8 + id % 8).toInt, (6 + (id * 3) % 8).toInt,
            (0 until 8).map { f =>
              if (f < 5) (
                ((grp + 29L * f) % 256).toInt,
                ((grp * 7 + 29L * f) % 256).toInt,
                ((grp * 13 + 29L * f) % 256).toInt)
              else (
                ((id * 9 + 31L * f) % 256).toInt,
                ((id * 11 + 31L * f) % 256).toInt,
                ((id * 17 + 31L * f) % 256).toInt)
            }))
        }
      }
  }

  /** CONTENT-ID-style video near-dup: per-frame signatures (exact
    * channel means — dimension-independent, so re-scaled copies of the
    * same content still match) shingle into k-consecutive-frame
    * digests, and videos sharing ≥ `minShared` sub-cap digests pair —
    * the q74 winnowing discipline lifted to the video modality:
    * matching is a digest EQUI-JOIN bounded by Σ_{df ≤ cap} df², never
    * all-pairs, and the per-video shingling is one bounded in-row pass
    * (the frame count is already capped by the AVI decoder).
    */
  def videoNearDup(
      assetDf: DataFrame, k: Int = 3, dfCap: Long = 32L,
      minShared: Long = 2L): DataFrame =
    signatureNearDup(videoFrameFeatures(assetDf).toDF()
      .select(col("asset_id"), col("frame_idx"),
        concat_ws(":", col("mean_b"), col("mean_g"), col("mean_r")).as("sig")),
      k, dfCap, minShared)

  /** The digest equi-join core of the video/container near-dup family:
    * per-asset ordered signature sequences shingle into k-consecutive
    * digests, document frequencies cap the join (Σ_{df ≤ cap} df²,
    * never all-pairs), assets sharing ≥ `minShared` digests pair.
    * Shared by q133 (AVI frame means) and q171 (MP4 opaque-sample byte
    * histograms) — any per-item signature plugs in.
    */
  def signatureNearDup(
      sigs: DataFrame, k: Int = 3, dfCap: Long = 32L,
      minShared: Long = 2L): DataFrame = {
    val sh = sigs.groupBy(col("asset_id"))
      .agg(expr(
        "transform(array_sort(collect_list(struct(frame_idx, sig))), x -> x.sig)")
        .as("seq"))
      .select(col("asset_id"), explode(expr(
        s"CASE WHEN size(seq) >= $k THEN transform(sequence(1, size(seq) - $k + 1), " +
          s"i -> md5(cast(concat_ws('|', slice(seq, i, $k)) AS binary))) " +
          "ELSE CAST(array() AS array<string>) END")).as("sh"))
      .distinct()
    val dfc = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val rare = sh.join(dfc.filter(col("df") <= dfCap), Seq("sh"))
      .select(col("asset_id"), col("sh"))
    rare.as("a")
      .join(rare.as("b"),
        col("a.sh") === col("b.sh") && col("a.asset_id") < col("b.asset_id"))
      .groupBy(col("a.asset_id"), col("b.asset_id"))
      .agg(count(lit(1)).as("n_shared"))
      .select(col("a.asset_id").as("vid_a"), col("b.asset_id").as("vid_b"),
        col("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** q133: video near-dup over the planted-segment corpus — same-group
    * videos pair on their shared 5-frame intro (3 shared shingles at
    * k = 3), everything replayed by the oracle from (doc_id, frame)
    * arithmetic through the shingle digests and pair counts.
    */
  def q133VideoNearDup(spark: SparkSession, dir: String): DataFrame =
    videoNearDup(nearDupVideos(spark, dir).toDF())
      .orderBy(col("vid_a"), col("vid_b"))

  /** Per-FRAME decode features over a video asset table: each decodable
    * AVI payload explodes into one row per frame with the frame's exact
    * integer channel means (sums divide exactly for constant fills; for
    * arbitrary content this is the floor of the mean). Non-decodable
    * payloads contribute no rows — a byte blob has no frames, and a fake
    * row would poison per-frame statistics. Plan shape: one narrow
    * mapPartitions, partition-preserving, no shuffle — the decode stays
    * where the bytes are, only the small per-frame stats flow on.
    */
  /** Derive a COMPRESSED video asset table: the same corpus third as
    * `decodableVideos` but as MS-RLE8 AVIs — each frame a solid fill of
    * palette index `(doc_id + 11*f) % 256` over the arithmetic palette,
    * so every decoded channel mean is pure (doc_id, frame) arithmetic
    * THROUGH the palette map. Exists for q53: the compressed decode path
    * (RLE expansion + palette lookup) gets the same oracle treatment the
    * uncompressed walk got from q48.
    */
  def decodableVideosRle(spark: SparkSession, dir: String): Dataset[DecodableAsset] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"))
      .where(col("doc_id") % 3 === 2)
      .repartition(col("doc_id"))
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val nFrames = (2 + id % 4).toInt
          DecodableAsset(id, "video", encodeAviRle8Const(
            (8 + id % 8).toInt, (6 + (id * 3) % 8).toInt,
            (0 until nFrames).map(f => ((id + 11L * f) % 256).toInt)))
        }
      }
  }

  /** q53: q48's per-frame oracle through the COMPRESSED codec path —
    * every payload is a genuine MS-RLE8 AVI, decoded via the RLE
    * expansion and palette map (never a fallback), and every exposed
    * value is arithmetic on (doc_id, frame index, palette formula). A
    * bug in the run decoder, the escape handling, the bottom-up unflip
    * or the palette lookup shifts a mean and fails the hash.
    */
  def q53RleVideoFrames(spark: SparkSession, dir: String): DataFrame =
    videoFrameFeatures(decodableVideosRle(spark, dir).toDF())
      .toDF()
      .orderBy(col("asset_id"), col("frame_idx"))

  def videoFrameFeatures(assetDf: DataFrame): Dataset[FrameFeatureRow] = {
    val spark = assetDf.sparkSession
    import spark.implicits._
    assetDf.select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          decodeAvi(payload).toSeq.flatMap { v =>
            val nPx = v.width.toLong * v.height
            v.frames.iterator.zipWithIndex.map { case (f, idx) =>
              var sb = 0L; var sg = 0L; var sr = 0L
              var i = 0
              while (i < f.length) {
                sb += f(i) & 0xFF; sg += f(i + 1) & 0xFF; sr += f(i + 2) & 0xFF
                i += 3
              }
              FrameFeatureRow(id, idx.toLong, v.width.toLong, v.height.toLong,
                v.frames.length.toLong, sb / nPx, sg / nPx, sr / nPx)
            }
          }
        }
      }
  }

  /** REAL frame sampling: decodable AVI payloads are decoded and every
    * `stride`-th frame re-encoded as a standalone BMP (the unit the image
    * ops — `resize`, `extractFeatures` — consume downstream), keyed by its
    * ORIGINAL frame index. Non-decodable payloads are skipped — no fake
    * frames. The byte-chunk `sampleFrames` remains the fallback shape for
    * opaque payloads (q26's accounting). Partition-preserving flatMap, no
    * shuffle.
    */
  def sampleFramesDecoded(assetDf: DataFrame, stride: Int): DataFrame = {
    require(stride > 0, "stride must be positive")
    val spark = assetDf.sparkSession
    import spark.implicits._
    assetDf.select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          decodeAvi(payload).toSeq.flatMap { v =>
            v.frames.iterator.zipWithIndex
              .filter(_._2 % stride == 0)
              .map { case (f, idx) =>
                (id, idx.toLong, encodeBmp(v.width, v.height, f)) }
          }
        }
      }
      .toDF("asset_id", "frame_idx", "frame_bmp")
  }

  /** Frame sampling for video assets: the payload split into `n` contiguous
    * chunks via posexplode — partition-preserving, one output row per
    * frame, deterministic chunk boundaries (`ceil(len/n)`-sized, last chunk
    * short).
    */
  def sampleFrames(assetDf: DataFrame, n: Int): DataFrame = {
    val len = octet_length(col("payload"))
    val chunk = ceil(len.cast("double") / n).cast("int")
    assetDf.filter(col("media_type") === "video")
      .select(col("asset_id"), col("payload"), chunk.as("chunk"))
      .select(col("asset_id"),
        posexplode(transform(sequence(lit(0), lit(n - 1)),
          i => col("payload").substr(i * col("chunk") + 1, col("chunk")))))
      .select(col("asset_id"), col("pos").as("frame_idx"), col("col").as("frame_bytes"))
      .filter(octet_length(col("frame_bytes")) > 0)
  }

  /** q25: the oracle-checkable relational surface of the asset table —
    * sizes, content hash, and typed metadata all verifiable engine-to-
    * engine (the binary payload itself is checked via its sha256).
    */
  def q25Multimodal(spark: SparkSession, dir: String): DataFrame =
    assets(spark, dir)
      .select(
        col("asset_id"), col("media_type"),
        octet_length(col("payload")).as("n_bytes"),
        sha2(col("payload"), 256).as("payload_sha"),
        col("width"), col("height"), col("format"))
      .orderBy(col("asset_id"))

  /** q43: the REAL-decode surface — every row's payload is genuine
    * container bytes (`decodableAssets`), the features come out of
    * `decodeBmp`/`decodeWav` (never the histogram fallback), and every
    * exposed column is a header- or content-derived value the oracle
    * recomputes as pure arithmetic on `doc_id`: BMP width/height and exact
    * per-channel means (constant-color fill), WAV rate/channels/total
    * samples. Mean channels ride as `round(mean*255)` longs — the decoded
    * float is `c/255f` exactly, so the round-trip is lossless and the
    * compare dodges float-vs-double hashing.
    */
  def q43DecodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    val feats = extractFeatures(spark, decodableAssets(spark, dir).toDF()).toDF()
    def f(i: Int) = element_at(col("features"), i).cast("double")
    val img = col("media_type") === "image"
    feats.select(
      col("asset_id"),
      col("media_type"),
      when(img, round(f(1)).cast("long")).as("img_width"),
      when(img, round(f(2)).cast("long")).as("img_height"),
      when(img, round(f(3) * 255).cast("long")).as("mean_b"),
      when(img, round(f(4) * 255).cast("long")).as("mean_g"),
      when(img, round(f(5) * 255).cast("long")).as("mean_r"),
      when(!img, round(f(1)).cast("long")).as("wav_rate"),
      when(!img, round(f(2)).cast("long")).as("wav_channels"),
      when(!img, round(f(3)).cast("long")).as("wav_samples"))
      .orderBy(col("asset_id"))
  }

  /** The PNG slice of the decodable corpus: the `doc_id % 3 == 2` rows the
    * BMP/WAV fixture (`decodableAssets`) leaves out, each a REAL truecolor
    * PNG whose pixel content is a COLUMN GRADIENT in every channel —
    * `(r,g,b)(x) = ((id + x), (id*5 + 2x), (id*11 + 3x)) mod 256` — so
    * consecutive scanline bytes differ and the Sub/Average/Paeth filters
    * (`encodePng` rotates all five by row) carry non-trivial deltas: a
    * constant fill would let a broken predictor hide behind zero diffs.
    * Channel SUMS stay pure integer arithmetic on `doc_id` for the oracle.
    */
  def decodablePngAssets(spark: SparkSession, dir: String): Dataset[DecodableAsset] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"))
      .where(col("doc_id") % 3 === 2)
      .repartition(col("doc_id"))
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = (8 + id % 16).toInt
          val h = (8 + (id * 3) % 16).toInt
          val px = new Array[Byte](w * h * 3)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val o = (y * w + x) * 3
              px(o) = ((id + x) % 256).toByte
              px(o + 1) = ((id * 5 + 2L * x) % 256).toByte
              px(o + 2) = ((id * 11 + 3L * x) % 256).toByte
              x += 1
            }
            y += 1
          }
          DecodableAsset(id, "image", encodePng(w, h, px))
        }
      }
  }

  /** The GRAYSCALE slice: `doc_id % 3 == 0` rows re-derived as real
    * color-type-0 PNGs with a 2-D gray gradient `g(x,y) = (id·7 + 3x +
    * 5y) mod 256` — row AND column variation, so the bpp=1 filter
    * lookback (Sub reads 1 byte back, not 3) carries non-trivial deltas.
    */
  def decodableGrayPngAssets(spark: SparkSession, dir: String): Dataset[DecodableAsset] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"))
      .where(col("doc_id") % 3 === 0)
      .repartition(col("doc_id"))
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = (8 + id % 16).toInt
          val h = (8 + (id * 3) % 16).toInt
          val px = new Array[Byte](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              px(y * w + x) = ((id * 7 + 3L * x + 5L * y) % 256).toByte
              x += 1
            }
            y += 1
          }
          DecodableAsset(id, "image", encodePngGray(w, h, px))
        }
      }
  }

  /** q78: grayscale PNG decode oracle-visible — the q69 discipline for
    * color type 0: dims plus the exact gray pixel SUM (all three decoded
    * channels replicate the sample, so any one channel's sum is the gray
    * sum) recomputed by the oracle as 2-D integer arithmetic on doc_id.
    */
  def q78GrayPngDecode(spark: SparkSession, dir: String): DataFrame = {
    val feats = extractFeatures(spark, decodableGrayPngAssets(spark, dir).toDF()).toDF()
    def f(i: Int) = element_at(col("features"), i).cast("double")
    feats.select(
      col("asset_id"),
      round(f(1)).cast("long").as("width"),
      round(f(2)).cast("long").as("height"),
      round(f(3) * 255 * f(1) * f(2)).cast("long").as("sum_gray"))
      .orderBy(col("asset_id"))
  }

  /** The WebP slice of the decodable corpus: `doc_id % 3 == 1` rows as
    * REAL VP8L-lossless WebPs whose pixels are a COLUMN gradient
    * `(r,g,b)(x) = ((id·2 + 5x), (id·7 + x), (id·3 + 4x)) mod 256` — so
    * row 0 codes as canonical-prefix literals under subtract-green and
    * every later row (an exact copy of its predecessor) codes as an LZ77
    * (length = w, distance = w) backward reference: the oracle corpus
    * exercises the prefix machinery, the transform inverse, AND the copy
    * loop, while channel sums stay pure `doc_id` arithmetic for the SQL
    * side (`height ×` the row-0 sums).
    */
  def decodableWebpAssets(spark: SparkSession, dir: String): Dataset[DecodableAsset] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"))
      .where(col("doc_id") % 3 === 1)
      .repartition(col("doc_id"))
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = (8 + id % 16).toInt
          val h = (8 + (id * 3) % 16).toInt
          val px = new Array[Byte](w * h * 3)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val o = (y * w + x) * 3
              px(o) = ((id * 2 + 5L * x) % 256).toByte
              px(o + 1) = ((id * 7 + x) % 256).toByte
              px(o + 2) = ((id * 3 + 4L * x) % 256).toByte
              x += 1
            }
            y += 1
          }
          DecodableAsset(id, "image", Webp.encodeWebpLossless(w, h, px))
        }
      }
  }

  /** q123: WebP VP8L decode oracle-visible — the q69 discipline over the
    * lossless-WebP slice: dims plus exact per-channel pixel sums of the
    * column gradient, recomputed by the oracle as integer arithmetic on
    * doc_id. A broken prefix decode, transform inverse, or LZ77 copy
    * shifts a sum and fails the hash.
    */
  def q123WebpDecode(spark: SparkSession, dir: String): DataFrame = {
    val feats = extractFeatures(spark, decodableWebpAssets(spark, dir).toDF()).toDF()
    def f(i: Int) = element_at(col("features"), i).cast("double")
    feats.select(
      col("asset_id"),
      round(f(1)).cast("long").as("width"),
      round(f(2)).cast("long").as("height"),
      round(f(3) * 255 * f(1) * f(2)).cast("long").as("sum_b"),
      round(f(4) * 255 * f(1) * f(2)).cast("long").as("sum_g"),
      round(f(5) * 255 * f(1) * f(2)).cast("long").as("sum_r"))
      .orderBy(col("asset_id"))
  }

  /** The JPEG slice of the decodable corpus (grayscale): `doc_id % 3 == 1`
    * rows as REAL baseline-sequential JPEGs whose 8×8 blocks are each
    * CONSTANT at `v(bx,by) = (id·7 + 13·bx + 31·by) mod 256` — a gradient
    * at block granularity, so consecutive DC differences are non-trivial
    * and every Huffman magnitude category gets exercised. With DC quant
    * step 8 the encode→decode loop is EXACT (see `Jpeg.encodeJpegGrayBlocks`),
    * which is what lets the q83 oracle recompute the decoded pixel sum as
    * pure integer arithmetic on `doc_id`. Every other row (`id % 2 == 0`)
    * carries a DRI restart interval of 2 MCUs, so RSTn handling sits on
    * the oracle path, not just in specs.
    */
  def decodableJpegAssets(spark: SparkSession, dir: String): Dataset[DecodableAsset] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"))
      .where(col("doc_id") % 3 === 1)
      .repartition(col("doc_id"))
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val wB = (2 + id % 4).toInt
          val hB = (2 + (id * 3) % 4).toInt
          DecodableAsset(id, "image", Jpeg.encodeJpegGrayBlocks(
            wB, hB,
            (bx, by) => ((id * 7 + 13L * bx + 31L * by) % 256).toInt,
            restartInterval = if (id % 2 == 0) 2 else 0))
        }
      }
  }

  /** The COLOR JPEG slice: `doc_id % 3 == 2` rows as 4:2:0 baseline JPEGs
    * whose 16×16 macroblocks are each constant in (Y,Cb,Cr) — per-MCU
    * formulas on `doc_id`, DC-only and exact, so the decoded RGB is the
    * decoder's integer `yccToRgb` of known inputs and the chroma-replicate
    * upsample is exact on flat macroblocks. The q84 oracle replays the
    * BT.601 fixed-point conversion (`>> 16` = floor division) and the
    * clamps in SQL — the full color path (interleaved MCU walk, two quant
    * tables, subsampled planes) sits under the hash.
    */
  def decodableJpegColorAssets(spark: SparkSession, dir: String): Dataset[DecodableAsset] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"))
      .where(col("doc_id") % 3 === 2)
      .repartition(col("doc_id"))
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val wM = (1 + id % 3).toInt
          val hM = (1 + (id * 5) % 3).toInt
          DecodableAsset(id, "image", Jpeg.encodeJpeg420Mcus(
            wM, hM,
            (mx, my) => (
              ((id * 3 + 17L * mx + 29L * my) % 256).toInt,
              ((id * 5 + 23L * mx + 7L * my) % 256).toInt,
              ((id * 11 + 19L * mx + 37L * my) % 256).toInt)))
        }
      }
  }

  /** q83: grayscale JPEG decode oracle-visible — dims plus the exact gray
    * pixel SUM (q78's discipline for the JPEG container): each 8×8 block
    * contributes 64·v(bx,by), which the oracle recomputes as 2-D integer
    * arithmetic on `doc_id`. A defect anywhere on the baseline path —
    * marker walk, canonical Huffman build, DC prediction, restart resets,
    * dequant, the DC IDCT — shifts some sum and fails the hash.
    */
  def q83JpegDecode(spark: SparkSession, dir: String): DataFrame = {
    val feats = extractFeatures(spark, decodableJpegAssets(spark, dir).toDF()).toDF()
    def f(i: Int) = element_at(col("features"), i).cast("double")
    feats.select(
      col("asset_id"),
      round(f(1)).cast("long").as("width"),
      round(f(2)).cast("long").as("height"),
      round(f(3) * 255 * f(1) * f(2)).cast("long").as("sum_gray"))
      .orderBy(col("asset_id"))
  }

  /** The PROGRESSIVE JPEG slice: the q83 block-gradient trick re-encoded
    * as SOF2 Annex G streams — DC successive-approximation scans (first
    * at Al=1, refine to Al=0) plus two AC spectral bands first+refined,
    * which over DC-only blocks are pure EOB-run streams spanning many
    * blocks; even ids add a restart interval of 2 blocks per scan. Decode
    * stays EXACT (DC quant 8), so the q112 oracle replays the decoded
    * pixel sum as doc_id arithmetic while the full progressive machinery
    * (multi-scan marker walk, bit-plane accumulation, EOB runs, restarts,
    * EOI reconstruction) sits under the hash.
    */
  def decodableProgressiveJpegAssets(
      spark: SparkSession, dir: String): Dataset[DecodableAsset] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"))
      .where(col("doc_id") % 3 === 1)
      .repartition(col("doc_id"))
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val wB = (2 + id % 4).toInt
          val hB = (2 + (id * 3) % 4).toInt
          val blocks = for (by <- 0 until hB; bx <- 0 until wB) yield {
            val c = new Array[Int](64)
            c(0) = ((id * 11 + 17L * bx + 23L * by) % 256).toInt - 128
            c
          }
          DecodableAsset(id, "image", Jpeg.encodeJpegProgGray(
            wB * 8, hB * 8, blocks,
            Array.tabulate(64)(i => if (i == 0) 8 else 16),
            restartInterval = if (id % 2 == 0) 2 else 0))
        }
      }
  }

  /** q112: PROGRESSIVE JPEG decode oracle-visible — q83's discipline for
    * the Annex G container: dims plus the exact gray pixel sum, every
    * progressive scan kind on the decode path.
    */
  def q112JpegProgressiveDecode(spark: SparkSession, dir: String): DataFrame = {
    val feats =
      extractFeatures(spark, decodableProgressiveJpegAssets(spark, dir).toDF()).toDF()
    def f(i: Int) = element_at(col("features"), i).cast("double")
    feats.select(
      col("asset_id"),
      round(f(1)).cast("long").as("width"),
      round(f(2)).cast("long").as("height"),
      round(f(3) * 255 * f(1) * f(2)).cast("long").as("sum_gray"))
      .orderBy(col("asset_id"))
  }

  /** q84: color 4:2:0 JPEG decode oracle-visible — dims plus exact
    * per-channel RGB sums; the oracle replays the decoder's fixed-point
    * BT.601 conversion (floor division by 2^16, then clamp) over the
    * per-macroblock (Y,Cb,Cr) formulas, each macroblock contributing 256
    * identical pixels.
    */
  def q84JpegColorDecode(spark: SparkSession, dir: String): DataFrame = {
    val feats = extractFeatures(spark, decodableJpegColorAssets(spark, dir).toDF()).toDF()
    def f(i: Int) = element_at(col("features"), i).cast("double")
    feats.select(
      col("asset_id"),
      round(f(1)).cast("long").as("width"),
      round(f(2)).cast("long").as("height"),
      round(f(3) * 255 * f(1) * f(2)).cast("long").as("sum_b"),
      round(f(4) * 255 * f(1) * f(2)).cast("long").as("sum_g"),
      round(f(5) * 255 * f(1) * f(2)).cast("long").as("sum_r"))
      .orderBy(col("asset_id"))
  }

  /** The GIF palette: RGB entry `i` = `(i, 7i mod 256, 13i mod 256)` —
    * the engine's arithmetic-palette convention in GIF's RGB table order,
    * so a palette-mapped channel sum is pure arithmetic on the index.
    */
  def gifArithmeticPalette: Array[Byte] = {
    val p = new Array[Byte](768)
    var i = 0
    while (i < 256) {
      p(i * 3) = i.toByte
      p(i * 3 + 1) = ((i * 7) % 256).toByte
      p(i * 3 + 2) = ((i * 13) % 256).toByte
      i += 1
    }
    p
  }

  /** The GIF slice: `doc_id % 3 == 0` rows as REAL GIF87a containers —
    * LZW-compressed 8-bit palette indices over `gifArithmeticPalette`,
    * index gradient `g(x,y) = (id·5 + 3x + 7y) mod 256` (2-D variation so
    * runs are short and every LZW code width transition inside the 9-bit
    * window is exercised). GIF is lossless, so the q86 oracle recomputes
    * every palette-mapped channel sum exactly as doc_id arithmetic — the
    * q69 PNG trick applied to the LZW compression family.
    */
  def decodableGifAssets(spark: SparkSession, dir: String): Dataset[DecodableAsset] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"))
      .where(col("doc_id") % 3 === 0)
      .repartition(col("doc_id"))
      .as[Long]
      .mapPartitions { it =>
        val pal = gifArithmeticPalette
        it.map { id =>
          val w = (8 + id % 16).toInt
          val h = (8 + (id * 3) % 16).toInt
          val idx = new Array[Byte](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              idx(y * w + x) = ((id * 5 + 3L * x + 7L * y) % 256).toByte
              x += 1
            }
            y += 1
          }
          DecodableAsset(id, "image", Gif.encodeGif(w, h, pal, idx))
        }
      }
  }

  /** q86: GIF/LZW decode oracle-visible — dims plus exact per-channel
    * pixel sums of the palette-mapped gradient (sum_r is the raw index
    * sum since `r(i) = i`; green/blue run through the ×7/×13 palette
    * arithmetic). A defect in the sub-block walk, the LSB-first code
    * reader, the dictionary build, or the palette mapping shifts a sum.
    */
  def q86GifDecode(spark: SparkSession, dir: String): DataFrame = {
    val feats = extractFeatures(spark, decodableGifAssets(spark, dir).toDF()).toDF()
    def f(i: Int) = element_at(col("features"), i).cast("double")
    feats.select(
      col("asset_id"),
      round(f(1)).cast("long").as("width"),
      round(f(2)).cast("long").as("height"),
      round(f(3) * 255 * f(1) * f(2)).cast("long").as("sum_b"),
      round(f(4) * 255 * f(1) * f(2)).cast("long").as("sum_g"),
      round(f(5) * 255 * f(1) * f(2)).cast("long").as("sum_r"))
      .orderBy(col("asset_id"))
  }

  /** One composited GIF animation frame's oracle surface (q114). */
  final case class GifFrameRow(
      asset_id: Long, frame_idx: Long, width: Long, height: Long,
      n_frames: Long, delay_cs: Long, sum_r: Long, wsum_g: Long, sum_b: Long)

  /** The ANIMATED/INTERLACED GIF slice: `doc_id % 3 == 0` rows as GIF89a
    * animations of 1–4 full-canvas frames over the arithmetic palette,
    * frame f's index gradient `g(x,y,f) = (id·5 + 3x + 7y + 11f) mod 256`,
    * per-frame GCE delays `(id + 7f) mod 100`, and INTERLACED storage on
    * odd ids (rows written in the spec's 4-pass order, so the decoder's
    * de-pass is load-bearing). GIF is lossless and frames are full-canvas
    * (disposal composition reduces to the frame's own content), so q114
    * replays per-frame channel sums as doc_id arithmetic — with a
    * POSITION-WEIGHTED green sum `Σ (x + 17y)·G(x,y)`: a plain channel
    * sum is row-permutation-invariant and would pass even if the
    * de-interlace were skipped; the weighted sum is not. Sub-rect frames,
    * transparency, and disposal 2/3 are pinned by hand-built streams in
    * GifAnimSpec (canvas-state replay in SQL would be a recursive mess).
    */
  def decodableGifAnimAssets(
      spark: SparkSession, dir: String): Dataset[DecodableAsset] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"))
      .where(col("doc_id") % 3 === 0)
      .repartition(col("doc_id"))
      .as[Long]
      .mapPartitions { it =>
        val pal = gifArithmeticPalette
        it.map { id =>
          val w = (8 + id % 16).toInt
          val h = (8 + (id * 3) % 16).toInt
          val nf = (1 + id % 4).toInt
          val frames = (0 until nf).map { f =>
            val idx = new Array[Byte](w * h)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                idx(y * w + x) = ((id * 5 + 3L * x + 7L * y + 11L * f) % 256).toByte
                x += 1
              }
              y += 1
            }
            Gif.GifFrameData(0, 0, w, h, idx,
              delayCs = ((id + 7L * f) % 100).toInt,
              disposal = 1, interlaced = id % 2 == 1)
          }
          DecodableAsset(id, "image", Gif.encodeGif89(w, h, pal, 0, frames))
        }
      }
  }

  /** q114: GIF animation frames oracle-visible — q48's per-frame shape
    * for the GIF container: every composited frame's dims, count, GCE
    * delay, exact channel sums, and the position-weighted green sum that
    * makes the interlace de-pass hash-visible.
    */
  def q114GifFrames(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Encoders
    decodableGifAnimAssets(spark, dir)
      .mapPartitions { it =>
        it.flatMap { a =>
          Gif.decodeGifFrames(a.payload).toSeq.flatMap { frames =>
            frames.zipWithIndex.map { case (fr, fi) =>
              val img = fr.image
              var sumR = 0L
              var wsumG = 0L
              var sumB = 0L
              var y = 0
              while (y < img.height) {
                var x = 0
                while (x < img.width) {
                  val o = (y * img.width + x) * 3
                  sumB += img.pixels(o) & 0xFF
                  wsumG += (x + 17L * y) * (img.pixels(o + 1) & 0xFF)
                  sumR += img.pixels(o + 2) & 0xFF
                  x += 1
                }
                y += 1
              }
              GifFrameRow(a.asset_id, fi.toLong, img.width.toLong,
                img.height.toLong, frames.length.toLong, fr.delayCs.toLong,
                sumR, wsumG, sumB)
            }
          }
        }
      }(Encoders.product[GifFrameRow])
      .toDF()
      .orderBy(col("asset_id"), col("frame_idx"))
  }

  /** G.711 telephony corpus: `doc_id % 3 == 1` rows as REAL mu-law
    * (even ids) / A-law (odd ids) WAV containers — companded bytes are
    * pure arithmetic on (doc_id, sample index), so the q89 oracle replays
    * the full expansion formulas.
    */
  def decodableG711Tones(spark: SparkSession, dir: String): Dataset[DecodableAsset] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"))
      .where(col("doc_id") % 3 === 1)
      .repartition(col("doc_id"))
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val n = (64 + id % 128).toInt
          val bytes = Array.tabulate(n)(i => ((id * 29 + i.toLong * 11) % 256).toByte)
          DecodableAsset(id, "audio",
            encodeWavG711(8000, 1, bytes, aLaw = id % 2 == 1))
        }
      }
  }

  /** q89: G.711 expansion oracle-visible — decode each telephony WAV and
    * expose the exact linear reconstruction: sample count plus a
    * POSITION-WEIGHTED integer checksum `Σ (i+1)·linear_i` (weighting
    * catches reordering a plain sum would forgive). The 16-bit-grid
    * expansion values are exact dyadic floats, so `round(f·32768)`
    * recovers every integer; the oracle replays both piecewise formulas
    * (complement/xor, segment shifts, bias) in SQL.
    */
  def q89G711Decode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    decodableG711Tones(spark, dir)
      .mapPartitions { it =>
        it.flatMap { a =>
          decodeWav(a.payload).map { w =>
            val checksum = w.samples.zipWithIndex.foldLeft(0L) {
              case (s, (f, i)) => s + (i + 1).toLong * math.round(f * 32768f)
            }
            (a.asset_id, w.samples.length.toLong, checksum)
          }
        }
      }
      .toDF("asset_id", "n_samples", "checksum")
      .orderBy(col("asset_id"))
  }

  /** Cross-container corpus: each document yields TWO assets with
    * IDENTICAL pixel content in DIFFERENT containers — asset `2·id` a
    * truecolor PNG, asset `2·id+1` a 24-bpp BMP of the same q69-style
    * column gradient. Byte-level dedup can never pair them (different
    * formats, different bytes); decode-normalized dedup must. Pixel (0,0)
    * carries the doc id's three low bytes verbatim — the gradient alone
    * is mod-256-periodic in `id` (doc 0 and doc 256 would render
    * identically), and cross-DOC collisions would break the oracle's
    * exactly-one-twin-per-doc shape.
    */
  def crossContainerAssets(spark: SparkSession, dir: String): Dataset[DecodableAsset] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"))
      .repartition(col("doc_id"))
      .as[Long]
      .mapPartitions { it =>
        it.flatMap { id =>
          val w = (8 + id % 16).toInt
          val h = (8 + (id * 3) % 16).toInt
          val rgb = new Array[Byte](w * h * 3)
          val bgr = new Array[Byte](w * h * 3)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val o = (y * w + x) * 3
              val r = ((id + x) % 256).toByte
              val g = ((id * 5 + 2L * x) % 256).toByte
              val b = ((id * 11 + 3L * x) % 256).toByte
              rgb(o) = r; rgb(o + 1) = g; rgb(o + 2) = b
              bgr(o) = b; bgr(o + 1) = g; bgr(o + 2) = r
              x += 1
            }
            y += 1
          }
          // doc-unique watermark: the id's low 3 bytes at pixel (0,0)
          rgb(0) = id.toByte; rgb(1) = (id >> 8).toByte; rgb(2) = (id >> 16).toByte
          bgr(0) = (id >> 16).toByte; bgr(1) = (id >> 8).toByte; bgr(2) = id.toByte
          Seq(
            DecodableAsset(id * 2, "image", encodePng(w, h, rgb)),
            DecodableAsset(id * 2 + 1, "image", encodeBmp(w, h, bgr)))
        }
      }
  }

  /** Decode any supported still-image container into the canonical
    * `BmpImage` form (BMP, PNG, baseline JPEG, GIF — the same chain
    * `decodeBytes` dispatches for features); `None` for everything else.
    */
  def decodeImage(payload: Array[Byte]): Option[BmpImage] =
    try decodeBmp(payload)
      .orElse(decodePng(payload))
      .orElse(Jpeg.decodeJpeg(payload))
      .orElse(Gif.decodeGif(payload))
      .orElse(Webp.decodeWebp(payload))
    catch { case scala.util.control.NonFatal(_) => None }

  /** Canonical digest of DECODED content: sha256 over big-endian dims +
    * the BGR top-down pixel bytes — container-independent by construction
    * (every codec lands in the same `BmpImage` normal form first).
    */
  def decodedPixelDigest(img: BmpImage): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val dims = new Array[Byte](8)
    putBe32(dims, 0, img.width)
    putBe32(dims, 4, img.height)
    md.update(dims)
    md.update(img.pixels)
    md.digest()
  }

  /** q87: decode-normalized EXACT dedup across containers — the byte-hash
    * exact dedup (q18) lifted to decoded content: every asset decodes to
    * the canonical pixel form, groups by `decodedPixelDigest`, and emits
    * the duplicate groups. Over `crossContainerAssets` the planted
    * PNG/BMP twins — byte-disjoint, pixel-identical — must pair exactly
    * (and nothing else may collide: the gradient is doc-unique), so ANY
    * divergence between two codecs' decode of the same image breaks a
    * pair and fails the hash. Shape at scale: per-row decode+digest
    * projection, ONE shuffle on the digest — identical to exact dedup.
    */
  def q87CrossContainerDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val digests = crossContainerAssets(spark, dir).mapPartitions { it =>
      it.map { a =>
        val img = decodeBmp(a.payload).orElse(decodePng(a.payload)).getOrElse(
          sys.error(s"corpus asset ${a.asset_id} failed to decode"))
        val dg = decodedPixelDigest(img)
        (a.asset_id, java.util.Base64.getEncoder.encodeToString(dg))
      }
    }.toDF("asset_id", "digest")
    digests.groupBy(col("digest"))
      .agg(
        min(col("asset_id")).as("min_asset"),
        max(col("asset_id")).as("max_asset"),
        count(lit(1)).as("n_copies"))
      .where(col("n_copies") > 1)
      .select(col("min_asset"), col("max_asset"), col("n_copies"))
      .orderBy(col("min_asset"))
  }

  /** 64-bit difference hash (dHash) of a decoded image — the standard
    * perceptual near-dup fingerprint: NN-downsample the gray plane to a
    * 9×8 grid, one bit per horizontally-adjacent pair (`left < right`),
    * bit `8y+x` set accordingly. Entirely integer (floor-div NN map,
    * floor-div gray), so hash values are oracle-replayable; robust to
    * re-encoding noise (a JPEG'd copy keeps its hash — spec-pinned),
    * which is what byte- and pixel-exact dedup can never give.
    */
  def dHash64(img: BmpImage): Long = {
    val g = new Array[Int](9 * 8)
    var y = 0
    while (y < 8) {
      val sy = (y.toLong * img.height / 8).toInt
      var x = 0
      while (x < 9) {
        val sx = (x.toLong * img.width / 9).toInt
        val o = (sy * img.width + sx) * 3
        g(y * 9 + x) = ((img.pixels(o) & 0xFF) + (img.pixels(o + 1) & 0xFF) +
          (img.pixels(o + 2) & 0xFF)) / 3
        x += 1
      }
      y += 1
    }
    var h = 0L
    var i = 0
    while (i < 64) {
      if (g((i / 8) * 9 + i % 8) < g((i / 8) * 9 + i % 8 + 1)) h |= 1L << i
      i += 1
    }
    h
  }

  /** q88: the perceptual hash oracle-visible — dHash over the grayscale
    * PNG gradient corpus (2-D variation, so the row sampling carries
    * content too), emitted as two unsigned 32-bit halves (bit 63 would
    * overflow a signed SQL sum). Every bit is floor-div integer
    * arithmetic on `doc_id`, recomputed by the oracle.
    */
  def q88ImageDhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    decodableGrayPngAssets(spark, dir).mapPartitions { it =>
      it.map { a =>
        val img = decodePng(a.payload).getOrElse(
          sys.error(s"corpus asset ${a.asset_id} failed to decode"))
        val h = dHash64(img)
        (a.asset_id, h >>> 32, h & 0xFFFFFFFFL)
      }
    }.toDF("asset_id", "dhash_hi", "dhash_lo").orderBy(col("asset_id"))
  }

  /** q85: the JPEG WRITE path oracle-visible — the full transcode loop
    * decode → NN 2× upscale → re-encode (REAL forward DCT + quantization,
    * `Jpeg.encodeJpegGray`) → decode over the q83 corpus. A 2× nearest
    * upscale of a per-8×8-block-constant image is per-block-constant
    * again (each block becomes four), the forward DCT of a flat block
    * recovers the exact DC-only coefficients through the general double
    * path (AC sums cancel below the rounding threshold), and DC quant 8
    * is lossless — so the re-encoded image decodes EXACTLY to the
    * replicated formula values: dims double, sums quadruple. A defect in
    * the forward DCT, quantization, entropy ENCODER, or padding logic
    * shifts a sum and fails the hash.
    */
  def q85JpegTranscode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val transcoded = decodableJpegAssets(spark, dir).mapPartitions { it =>
      val quant = Array.tabulate(64)(k => if (k == 0) 8 else 16)
      it.map { a =>
        // corpus payloads are valid by construction; a decode failure here
        // is a codec defect and SHOULD fail the query loudly
        val img = Jpeg.decodeJpeg(a.payload).getOrElse(
          sys.error(s"corpus asset ${a.asset_id} failed to decode"))
        val w2 = img.width * 2
        val h2 = img.height * 2
        val up = resampleNearest(img, w2, h2)
        // decoded grayscale replicates into all three BGR channels — any
        // one channel IS the gray plane
        val gray = new Array[Byte](w2 * h2)
        var i = 0
        while (i < gray.length) { gray(i) = up(i * 3); i += 1 }
        DecodableAsset(a.asset_id, "image", Jpeg.encodeJpegGray(w2, h2, gray, quant))
      }
    }
    val feats = extractFeatures(spark, transcoded.toDF()).toDF()
    def f(i: Int) = element_at(col("features"), i).cast("double")
    feats.select(
      col("asset_id"),
      round(f(1)).cast("long").as("width"),
      round(f(2)).cast("long").as("height"),
      round(f(3) * 255 * f(1) * f(2)).cast("long").as("sum_gray"))
      .orderBy(col("asset_id"))
  }

  /** q69: the PNG decode surface made oracle-visible — every payload is a
    * genuine deflate-compressed PNG (`decodablePngAssets`), features come
    * out of `decodePng` through the zlib inflate + unfilter path (never
    * the fallback — the gradient content makes a silent fallback shift
    * every sum), and the exposed columns are dims plus exact per-channel
    * pixel SUMS the oracle recomputes as integer arithmetic on `doc_id`
    * (`round(meanFeature·255·w·h)` recovers the integer sum exactly:
    * relative float error ~1e-7 on sums < 2^18).
    */
  def q69PngDecode(spark: SparkSession, dir: String): DataFrame = {
    val feats = extractFeatures(spark, decodablePngAssets(spark, dir).toDF()).toDF()
    def f(i: Int) = element_at(col("features"), i).cast("double")
    feats.select(
      col("asset_id"),
      round(f(1)).cast("long").as("width"),
      round(f(2)).cast("long").as("height"),
      round(f(3) * 255 * f(1) * f(2)).cast("long").as("sum_b"),
      round(f(4) * 255 * f(1) * f(2)).cast("long").as("sum_g"),
      round(f(5) * 255 * f(1) * f(2)).cast("long").as("sum_r"))
      .orderBy(col("asset_id"))
  }

  /** q190: the q69 contract over the LEGACY PNG forms — per document
    * an Adam7-interlaced truecolor (`id % 4 == 0`), Adam7 gray (== 1),
    * sequential 8-bit palette (== 2), or Adam7 4-bit palette (== 3)
    * image with gradient content (a silent pass-placement or
    * bit-unpacking slip shifts every sum), decoded by the extended
    * `decodePng` into exact per-channel pixel sums the oracle
    * recomputes as pure (doc_id, x, y) integer arithmetic. Scale
    * shape: per-row encode+decode walk, zero shuffle before the sort.
    */
  def q190PngLegacyDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = (8 + id % 9).toInt
        val h = (5 + id % 7).toInt
        val form = (id % 4).toInt
        val png = form match {
          case 0 =>
            val rgb = new Array[Byte](w * h * 3)
            for (y <- 0 until h; x <- 0 until w) {
              val p = (y * w + x) * 3
              rgb(p) = ((id + 3 * x + 7 * y) % 256).toByte
              rgb(p + 1) = ((2 * id + 5 * x + y) % 256).toByte
              rgb(p + 2) = ((x.toLong * y + id) % 256).toByte
            }
            encodePngExt(w, h, 2, 8, interlace = true, rgb)
          case 1 =>
            val g = new Array[Byte](w * h)
            for (y <- 0 until h; x <- 0 until w)
              g(y * w + x) = ((id + 11 * x + 13 * y) % 256).toByte
            encodePngExt(w, h, 0, 8, interlace = true, g)
          case f =>
            val plte = new Array[Byte](16 * 3)
            for (j <- 0 until 16) {
              plte(j * 3) = ((id * 3 + 5 * j) % 256).toByte
              plte(j * 3 + 1) = ((id * 7 + j) % 256).toByte
              plte(j * 3 + 2) = ((2 * j + id) % 256).toByte
            }
            val idx = new Array[Byte](w * h)
            for (y <- 0 until h; x <- 0 until w)
              idx(y * w + x) = ((x + y + id) % 16).toByte
            if (f == 2) encodePngExt(w, h, 3, 8, interlace = false, idx, plte)
            else encodePngExt(w, h, 3, 4, interlace = true, idx, plte)
        }
        val img = decodePng(png).getOrElse(BmpImage(0, 0, 0, Array.empty))
        var sr = 0L; var sg = 0L; var sb = 0L
        var i = 0
        while (i < img.pixels.length) {
          sb += img.pixels(i) & 0xff
          sg += img.pixels(i + 1) & 0xff
          sr += img.pixels(i + 2) & 0xff
          i += 3
        }
        val label = form match {
          case 0 => "rgb_adam7"
          case 1 => "gray_adam7"
          case 2 => "palette8"
          case _ => "palette4_adam7"
        }
        (id, label, img.width.toLong, img.height.toLong, sr, sg, sb)
      })
      .toDF("doc_id", "form", "width", "height", "sum_r", "sum_g", "sum_b")
      .orderBy(col("doc_id"))
  }

  /** q193: the q190 contract over the DEPTH and ALPHA forms — 1-bit
    * gray (`id % 6 == 0`, the fax-like form; levels scale by 255),
    * Adam7 4-bit gray (== 1, scale 17), 16-bit gray (== 2, high-byte
    * reduction — the libpng strip-16 convention), Adam7 16-bit
    * truecolor (== 3), RGBA (== 4, color kept / alpha dropped — the
    * modern-web norm), and Adam7 gray+alpha (== 5); gradient content,
    * exact per-channel sums recomputed by the oracle as (doc_id, x, y)
    * integer arithmetic.
    */
  def q193PngDepthDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = (8 + id % 9).toInt
        val h = (5 + id % 7).toInt
        val form = (id % 6).toInt
        val png = form match {
          case 0 =>
            val lvl = new Array[Byte](w * h)
            for (y <- 0 until h; x <- 0 until w)
              lvl(y * w + x) = ((x + y + id) % 2).toByte
            encodePngExt(w, h, 0, 1, interlace = false, lvl)
          case 1 =>
            val lvl = new Array[Byte](w * h)
            for (y <- 0 until h; x <- 0 until w)
              lvl(y * w + x) = ((x + 2 * y + id) % 16).toByte
            encodePngExt(w, h, 0, 4, interlace = true, lvl)
          case 2 =>
            val g16 = new Array[Byte](w * h * 2)
            for (y <- 0 until h; x <- 0 until w) {
              val v = ((id * 131 + 29 * x + 57 * y) % 65536).toInt
              g16((y * w + x) * 2) = (v >> 8).toByte
              g16((y * w + x) * 2 + 1) = (v & 0xff).toByte
            }
            encodePngExt(w, h, 0, 16, interlace = false, g16)
          case 3 =>
            val c16 = new Array[Byte](w * h * 6)
            for (y <- 0 until h; x <- 0 until w) {
              val vals = Array(
                ((id * 7 + 13 * x + 31 * y) % 65536).toInt,
                ((id * 3 + 5 * x + 11 * y) % 65536).toInt,
                ((x.toLong * y + id) % 65536).toInt)
              var c = 0
              while (c < 3) {
                c16((y * w + x) * 6 + 2 * c) = (vals(c) >> 8).toByte
                c16((y * w + x) * 6 + 2 * c + 1) = (vals(c) & 0xff).toByte
                c += 1
              }
            }
            encodePngExt(w, h, 2, 16, interlace = true, c16)
          case 4 =>
            val rgba = new Array[Byte](w * h * 4)
            for (y <- 0 until h; x <- 0 until w) {
              val p = (y * w + x) * 4
              rgba(p) = ((id + 3 * x + 7 * y) % 256).toByte
              rgba(p + 1) = ((2 * id + 5 * x + y) % 256).toByte
              rgba(p + 2) = ((x.toLong * y + id) % 256).toByte
              rgba(p + 3) = ((x + y) % 256).toByte // dropped by decode
            }
            encodePngExt(w, h, 6, 8, interlace = false, rgba)
          case _ =>
            val ga = new Array[Byte](w * h * 2)
            for (y <- 0 until h; x <- 0 until w) {
              ga((y * w + x) * 2) = ((id + 11 * x + 13 * y) % 256).toByte
              ga((y * w + x) * 2 + 1) = ((x * 5 + y) % 256).toByte
            }
            encodePngExt(w, h, 4, 8, interlace = true, ga)
        }
        val img = decodePng(png).getOrElse(BmpImage(0, 0, 0, Array.empty))
        var sr = 0L; var sg = 0L; var sb = 0L
        var i = 0
        while (i < img.pixels.length) {
          sb += img.pixels(i) & 0xff
          sg += img.pixels(i + 1) & 0xff
          sr += img.pixels(i + 2) & 0xff
          i += 3
        }
        val label = form match {
          case 0 => "gray1"
          case 1 => "gray4_adam7"
          case 2 => "gray16"
          case 3 => "rgb16_adam7"
          case 4 => "rgba8"
          case _ => "graya8_adam7"
        }
        (id, label, img.width.toLong, img.height.toLong, sr, sg, sb)
      })
      .toDF("doc_id", "form", "width", "height", "sum_r", "sum_g", "sum_b")
      .orderBy(col("doc_id"))
  }

  /** q199: PNG tRNS TRANSPARENCY — the last non-exotic PNG form after
    * q190/q193 (palette alpha table, gray level key, RGB color key,
    * sequential and Adam7): the decoder must surface per-pixel alpha
    * from the chunk, not just skip it, so the output pins `alpha_sum`
    * and `n_transparent` alongside the q193 color sums. Forms by
    * `id % 4`: 4-bit palette + 8-entry alpha table (0), gray8 + level
    * key (1), truecolor8 + RGB key hitting exactly pixel (0,0) (2),
    * 8-bit palette ADAM7 + alpha table (3). Color stays un-composited
    * (alpha surfaced as data); every sum is (doc_id, x, y) integer
    * arithmetic the oracle replays.
    */
  def q199PngTrns(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = (8 + id % 9).toInt
        val h = (5 + id % 7).toInt
        val form = (id % 4).toInt
        val plte = new Array[Byte](48)
        for (j <- 0 until 16) {
          plte(j * 3) = (j * 16).toByte
          plte(j * 3 + 1) = (255 - j * 16).toByte
          plte(j * 3 + 2) = ((j * j) % 256).toByte
        }
        val alphaTab = Array.tabulate[Byte](8)(j => (j * 17).toByte)
        val png = form match {
          case 0 =>
            val idxs = new Array[Byte](w * h)
            for (y <- 0 until h; x <- 0 until w)
              idxs(y * w + x) = ((x + y + id) % 16).toByte
            encodePngExt(w, h, 3, 4, interlace = false, idxs, plte, alphaTab)
          case 1 =>
            val g = new Array[Byte](w * h)
            for (y <- 0 until h; x <- 0 until w)
              g(y * w + x) = ((x * 3 + y * 5 + id) % 256).toByte
            val key = (id % 256).toInt
            encodePngExt(w, h, 0, 8, interlace = false, g,
              trns = Array[Byte](0, key.toByte))
          case 2 =>
            val rgb = new Array[Byte](w * h * 3)
            for (y <- 0 until h; x <- 0 until w) {
              val p = (y * w + x) * 3
              rgb(p) = ((id + x) % 256).toByte
              rgb(p + 1) = ((id * 2 + y) % 256).toByte
              rgb(p + 2) = ((id * 3 + x + y) % 256).toByte
            }
            val key = Array[Byte](0, (id % 256).toByte,
              0, ((id * 2) % 256).toByte, 0, ((id * 3) % 256).toByte)
            encodePngExt(w, h, 2, 8, interlace = false, rgb, trns = key)
          case _ =>
            val idxs = new Array[Byte](w * h)
            for (y <- 0 until h; x <- 0 until w)
              idxs(y * w + x) = ((x * 2 + y + id) % 16).toByte
            encodePngExt(w, h, 3, 8, interlace = true, idxs, plte, alphaTab)
        }
        val (img, alpha) = decodePngWithAlpha(png)
          .getOrElse((BmpImage(0, 0, 0, Array.empty), null))
        var sr = 0L; var sg = 0L; var sb = 0L
        var i = 0
        while (i < img.pixels.length) {
          sb += img.pixels(i) & 0xff
          sg += img.pixels(i + 1) & 0xff
          sr += img.pixels(i + 2) & 0xff
          i += 3
        }
        var aSum = 0L
        var nTrans = 0L
        if (alpha != null) {
          var k = 0
          while (k < alpha.length) {
            val a = alpha(k) & 0xff
            aSum += a
            if (a == 0) nTrans += 1
            k += 1
          }
        }
        val label = form match {
          case 0 => "plte4_trns"
          case 1 => "gray8_key"
          case 2 => "rgb8_key"
          case _ => "plte8_trns_adam7"
        }
        (id, label, img.width.toLong, img.height.toLong, sr, sg, sb,
          aSum, nTrans)
      })
      .toDF("doc_id", "form", "width", "height", "sum_r", "sum_g", "sum_b",
        "alpha_sum", "n_transparent")
      .orderBy(col("doc_id"))
  }

  /** q46: the resize kernel, oracle-checked end-to-end over the decodable
    * image assets: resample each constant-color BMP to a fixed target,
    * decode the RESIZED payload, and expose its header/content values.
    * Nearest-neighbor resampling of a constant-color image preserves the
    * channel means exactly, the target dims are constants, and the
    * re-encoded payload length is pure arithmetic (54 + padded-row × h) —
    * so the oracle sees the whole decode → resample → re-encode → decode
    * loop without owning a codec.
    */
  def q46Resize(spark: SparkSession, dir: String): DataFrame = {
    val targetW = 16
    val targetH = 12
    val imgs = decodableAssets(spark, dir).toDF()
      .filter(col("media_type") === "image")
      .select(col("asset_id"), col("media_type"), col("payload"),
        (lit(8) + col("asset_id") % 16).cast("int").as("width"),
        (lit(8) + (col("asset_id") * 3) % 16).cast("int").as("height"),
        lit("bmp").as("format"))
    val resized = resize(imgs, targetW, targetH)
    val feats = extractFeatures(spark, resized).toDF()
    def f(i: Int) = element_at(col("features"), i).cast("double")
    resized.select(col("asset_id"), octet_length(col("payload")).as("n_bytes"))
      .join(feats, Seq("asset_id"))
      .select(
        col("asset_id"),
        col("n_bytes").cast("long").as("n_bytes"),
        round(f(1)).cast("long").as("width"),
        round(f(2)).cast("long").as("height"),
        round(f(3) * 255).cast("long").as("mean_b"),
        round(f(4) * 255).cast("long").as("mean_g"),
        round(f(5) * 255).cast("long").as("mean_r"))
      .orderBy(col("asset_id"))
  }

  /** q48: the REAL-decode surface for the third modality — every row's
    * payload is a genuine uncompressed-AVI container (`decodableVideos`),
    * exploded into per-frame rows by `videoFrameFeatures` (through
    * `decodeAvi`, never a fallback), and every exposed column is a header-
    * or content-derived value the oracle recomputes as pure arithmetic on
    * (`doc_id`, frame index): stream shape from the strf header, frame
    * count from the movi walk, exact per-frame channel means from the
    * constant fills. A codec bug anywhere — chunk walk, row unflip, frame
    * split — shifts some mean or count and fails the hash.
    */
  def q48VideoFrames(spark: SparkSession, dir: String): DataFrame =
    videoFrameFeatures(decodableVideos(spark, dir).toDF())
      .toDF()
      .orderBy(col("asset_id"), col("frame_idx"))

  /** Derive an audio asset table with NON-silent deterministic content:
    * the `doc_id % 3 == 1` third of the corpus as mono 16-bit PCM WAVs
    * whose every sample is pure arithmetic on (`doc_id`, sample index) —
    * `(id*31 + i*7) % 65536 - 32768` — so a transform over the CONTENT
    * (not just the header) is oracle-checkable. q43's audio rows stay the
    * silence-payload table (its oracle surface is header-derived and
    * pinned); this one exists for q50's resample loop.
    */
  def decodableAudioTones(spark: SparkSession, dir: String): Dataset[DecodableAsset] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"))
      .where(col("doc_id") % 3 === 1)
      .repartition(col("doc_id"))
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val rate = (8000 + (id % 8) * 1000).toInt
          val n = (64 + id % 128).toInt
          val samples = Array.tabulate(n)(i =>
            (((id * 31 + i.toLong * 7) % 65536) - 32768).toShort)
          DecodableAsset(id, "audio", encodeWavPcm16(rate, 1, samples))
        }
      }
  }

  /** q50: the resample loop for AUDIO, oracle-checked end-to-end over the
    * tone assets (q46's argument applied to the second modality): decode →
    * NN resample to a fixed 4 kHz → re-encode as PCM16 → decode the
    * RESAMPLED payload, exposing its rate, sample count and an exact
    * integer checksum over the decoded samples. Every value is pure
    * (doc_id, index) arithmetic for the oracle: the NN index map and the
    * output length are integer expressions, and 16-bit samples round-trip
    * floats exactly. A bug anywhere in the loop — chunk walk, sample
    * normalization, resample map, writer layout — shifts the checksum.
    * Non-decodable rows contribute no output row (error-as-value), which
    * the oracle's row count would expose.
    */
  def q50AudioResample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val outRate = 4000
    decodableAudioTones(spark, dir)
      .mapPartitions { it =>
        it.flatMap { a =>
          decodeWav(a.payload).map { full =>
            val res = resampleWav(full, outRate)
            val re = decodeWav(encodeWavPcm16(res.sampleRate, res.channels,
              res.samples.map(f => math.round(f * 32768f).toShort))).get
            val checksum = re.samples.foldLeft(0L)((s, f) => s + math.round(f * 32768f))
            (a.asset_id, re.sampleRate.toLong, re.samples.length.toLong, checksum)
          }
        }
      }
      .toDF("asset_id", "out_rate", "n_out", "checksum")
      .orderBy(col("asset_id"))
  }

  /** One audio analysis window's oracle surface (q118). */
  final case class AudioWindowRow(
      asset_id: Long, win_idx: Long, n_samples: Long, energy: Long,
      n_zero_cross: Long, peak: Long)

  /** q118: WINDOWED AUDIO FEATURES — the frame-level acoustic statistics
    * every speech/audio curation pipeline computes before anything
    * model-based (silence/clipping detection, energy-based segmentation):
    * per 16-sample window of each decoded tone asset, the exact integer
    * energy `Σ s²`, zero-crossing count (sign change vs the previous
    * sample INSIDE the window; `s ≥ 0` counts positive), and peak `|s|`.
    * 16-bit samples round-trip the decoder's float normalization exactly
    * (q50's argument), so every statistic is pure (doc_id, i) arithmetic
    * the oracle replays. Trailing partial windows are emitted (their
    * n_samples says so) — a real segmenter needs the tail.
    *
    * Scale shape: per-row decode + one bounded pass per asset (windows
    * are O(samples/16) rows out) — narrow mapPartitions, no shuffle
    * before the final sort.
    */
  def q118AudioWindows(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Encoders
    decodableAudioTones(spark, dir)
      .mapPartitions { it =>
        it.flatMap { a =>
          decodeWav(a.payload).toSeq.flatMap { wav =>
            val s = wav.samples.map(f => math.round(f * 32768f).toLong)
            val nw = (s.length + 15) / 16
            (0 until nw).map { w =>
              val from = w * 16
              val until = math.min(from + 16, s.length)
              var energy = 0L
              var zc = 0L
              var peak = 0L
              var i = from
              while (i < until) {
                energy += s(i) * s(i)
                if (i > from && ((s(i) >= 0) != (s(i - 1) >= 0))) zc += 1
                peak = math.max(peak, math.abs(s(i)))
                i += 1
              }
              AudioWindowRow(a.asset_id, w.toLong, (until - from).toLong,
                energy, zc, peak)
            }
          }
        }
      }(Encoders.product[AudioWindowRow])
      .toDF()
      .orderBy(col("asset_id"), col("win_idx"))
  }

  /** One frame-transition row of the shot detector (q119). */
  final case class ShotRow(
      asset_id: Long, frame_idx: Long, n_pixels: Long,
      diff_b: Long, diff_g: Long, diff_r: Long, is_shot: Int)

  /** q119: SHOT-BOUNDARY DETECTION — the standard first pass of any video
    * curation pipeline (sample one keyframe per shot, drop static
    * segments): per adjacent frame pair of each decoded AVI, the exact
    * integer per-channel absolute difference of frame SUMS, flagged a cut
    * when the combined per-pixel change reaches the threshold
    * (`diff_b + diff_g + diff_r ≥ 90 · n_pixels` — an average shift of
    * 30/channel). On the constant-fill corpus the frame sums are pure
    * (doc_id, f) arithmetic, so the oracle replays every diff and
    * verdict; content-dependent correctness (sums, not means — stays
    * integer) is what the q48 decode gate already pins.
    */
  def q119ShotDetect(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Encoders
    decodableVideos(spark, dir)
      .mapPartitions { it =>
        it.flatMap { a =>
          decodeAvi(a.payload).toSeq.flatMap { v =>
            val np = v.width.toLong * v.height
            val sums = v.frames.map { f =>
              var b = 0L; var g = 0L; var r = 0L
              var i = 0
              while (i < f.length) {
                b += f(i) & 0xFF; g += f(i + 1) & 0xFF; r += f(i + 2) & 0xFF
                i += 3
              }
              (b, g, r)
            }
            (1 until sums.length).map { fi =>
              val db = math.abs(sums(fi)._1 - sums(fi - 1)._1)
              val dg = math.abs(sums(fi)._2 - sums(fi - 1)._2)
              val dr = math.abs(sums(fi)._3 - sums(fi - 1)._3)
              ShotRow(a.asset_id, fi.toLong, np, db, dg, dr,
                if (db + dg + dr >= 90L * np) 1 else 0)
            }
          }
        }
      }(Encoders.product[ShotRow])
      .toDF()
      .orderBy(col("asset_id"), col("frame_idx"))
  }

  /** Gradient BMP: pixel (x, y) channel values are affine in the
    * coordinates — `b = (seed + 5x + 11y) % 256`, `g = (seed*7 + …)`,
    * `r = (seed*13 + …)` — the image-side analog of the audio tones:
    * CONTENT that varies per pixel (a constant fill cannot distinguish
    * bilinear from nearest) yet stays pure integer arithmetic an oracle
    * can recompute per coordinate. Channel bases match `encodeBmpConst`'s
    * so the two tables stay visually comparable in oracles.
    */
  def encodeBmpGradient(width: Int, height: Int, seed: Long): Array[Byte] = {
    val px = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val o = (y * width + x) * 3
        val grad = 5L * x + 11L * y
        px(o) = ((seed + grad) % 256).toByte
        px(o + 1) = ((seed * 7 + grad) % 256).toByte
        px(o + 2) = ((seed * 13 + grad) % 256).toByte
        x += 1
      }
      y += 1
    }
    encodeBmp(width, height, px)
  }

  /** Derive an image asset table with NON-constant deterministic content:
    * the `doc_id % 3 == 0` third of the corpus as gradient BMPs (same dims
    * as `decodableAssets`' images). q43/q46's pinned surfaces stay on the
    * constant fills; this table exists for q51, where the kernel under
    * test must see pixel VARIATION to be distinguishable from NN.
    */
  def decodableImageGradients(spark: SparkSession, dir: String): Dataset[DecodableAsset] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"))
      .where(col("doc_id") % 3 === 0)
      .repartition(col("doc_id"))
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          DecodableAsset(id, "image", encodeBmpGradient(
            (8 + id % 16).toInt, (8 + (id * 3) % 16).toInt, id))
        }
      }
  }

  /** q51: the BILINEAR resize kernel oracle-checked end-to-end — q46's
    * decode → resample → re-encode → decode loop, but over gradient images
    * (constant fills cannot tell bilinear from nearest) and with exact
    * per-channel pixel SUMS instead of means (sums are integers; means
    * would reintroduce float division). The fixed-point kernel makes every
    * output byte `floor(Σ corner·weight / (2w·2h))` — pure integer
    * arithmetic the oracle replays per output coordinate, so a wrong
    * weight, a mis-clamped edge, an unflipped row or a truncation-vs-floor
    * slip anywhere in the loop shifts a sum and fails the hash.
    */
  def q51ResizeBilinear(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tw = 16
    val th = 12
    decodableImageGradients(spark, dir)
      .mapPartitions { it =>
        it.flatMap { a =>
          decodeBmp(a.payload).map { img =>
            val re = decodeBmp(encodeBmp(tw, th,
              resampleBilinear(img, tw, th))).get
            var sb = 0L; var sg = 0L; var sr = 0L
            var i = 0
            while (i < re.pixels.length) {
              sb += re.pixels(i) & 0xFF
              sg += re.pixels(i + 1) & 0xFF
              sr += re.pixels(i + 2) & 0xFF
              i += 3
            }
            (a.asset_id, re.width.toLong, re.height.toLong, sb, sg, sr)
          }
        }
      }
      .toDF("asset_id", "width", "height", "sum_b", "sum_g", "sum_r")
      .orderBy(col("asset_id"))
  }

  /** q52: the LINEAR audio resample kernel oracle-checked end-to-end —
    * q50's decode → resample → re-encode → decode loop with the
    * interpolating kernel. The biased-integer lerp keeps every output
    * sample exact (see `resampleWavLinear`), so the checksum is an
    * integer the oracle recomputes from the tone formula; the kernel is
    * distinguishable from NN because the tones step by 7 per sample and
    * the 4 kHz target rarely divides the source rate evenly.
    */
  def q52AudioLinearResample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val outRate = 4000
    decodableAudioTones(spark, dir)
      .mapPartitions { it =>
        it.flatMap { a =>
          decodeWav(a.payload).map { full =>
            val res = resampleWavLinear(full, outRate)
            val re = decodeWav(encodeWavPcm16(res.sampleRate, res.channels,
              res.samples.map(f => math.round(f * 32768f).toShort))).get
            val checksum = re.samples.foldLeft(0L)((s, f) => s + math.round(f * 32768f))
            (a.asset_id, re.sampleRate.toLong, re.samples.length.toLong, checksum)
          }
        }
      }
      .toDF("asset_id", "out_rate", "n_out", "checksum")
      .orderBy(col("asset_id"))
  }

  /** q26: per-frame byte accounting for the video subset — frame boundaries
    * are pure arithmetic, so the oracle can verify every frame length.
    */
  def q26Frames(spark: SparkSession, dir: String): DataFrame = {
    val a = assets(spark, dir).filter(col("media_type") === "video")
    val n = 4
    val len = octet_length(col("payload"))
    val chunk = ceil(len.cast("double") / n).cast("int")
    a.select(col("asset_id"), col("payload"), len.as("len"), chunk.as("chunk"))
      .select(col("asset_id"), col("len"), col("chunk"),
        posexplode(transform(sequence(lit(0), lit(n - 1)), i => i)))
      .withColumn("frame_bytes",
        greatest(lit(0), least(col("chunk"), col("len") - col("col") * col("chunk"))))
      .filter(col("frame_bytes") > 0) // a short tail can leave empty frames
      .select(col("asset_id"), col("pos").as("frame_idx"), col("frame_bytes"))
      .orderBy(col("asset_id"), col("frame_idx"))
  }

  /** q138: LOSSY WebP (VP8 key frame) decode end-to-end — the q83/q123
    * DC-exact trick in VP8 form. Per document a horizontal macroblock
    * strip (`k = 2 + id % 6` MBs) is encoded as a real VP8 key frame:
    * every MB `DC_PRED` carrying only a Y2 DC coefficient
    * `16·raw_i` with `raw_i = ((id + 13i) mod 15) − 7` (both signs,
    * token categories through CAT6), `(id + i) mod 4 == 0` MBs
    * skip-flagged. At quantizer index 0 the `dequant → iWHT → DC-only
    * iDCT` chain is exact: each MB's residue is `2·raw_i` and DC
    * prediction chains left-to-right, so MB i reconstructs to the
    * PREFIX SUM `128 + 2·Σ_{j≤i, ¬skip} raw_j` — which the oracle
    * replays as a window sum. Neutral chroma makes BGR exactly
    * grayscale through the shared JFIF converter. Any bool-coder,
    * mode, token, WHT/DCT, prediction, or container slip changes the
    * channel sums.
    */
  def q138Vp8Decode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"))
      .repartition(col("doc_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        val k = (2 + id % 6).toInt
        val raw = Array.tabulate(k)(i => (((id + 13L * i) % 15) - 7).toInt)
        val skip = Array.tabulate(k)(i => (id + i) % 4 == 0)
        val webp = Vp8.webpFromVp8(
          Vp8.encodeVp8Strip(raw.map(_ * 16), skip))
        val img = Webp.decodeWebp(webp).get
        var sb = 0L; var sg = 0L; var sr = 0L
        var i = 0
        while (i < img.width * img.height) {
          sb += img.pixels(i * 3) & 0xff
          sg += img.pixels(i * 3 + 1) & 0xff
          sr += img.pixels(i * 3 + 2) & 0xff
          i += 1
        }
        (id, img.width.toLong, img.height.toLong, sb, sg, sr)
      })
      .toDF("doc_id", "width", "height", "sum_b", "sum_g", "sum_r")
      .orderBy(col("doc_id"))
  }

  /** q168: VP8 `B_PRED` (4×4 intra) decode end-to-end — the q138 strip
    * extended with B_PRED macroblocks. MB 0 is the q138 `DC_PRED`
    * flat-value MB (`v0 = 128 + 2·((id mod 15) − 7)`); every MB `i ≥ 1`
    * is `B_PRED` with all sixteen sub-modes `B_TM_PRED` and ONE DC
    * residual in subblock (3,3): token `2·m_i`, `m_i = ((id + 7i) mod
    * 9) − 4`, which dequantizes+iDCTs to exactly `m_i` at quantizer 0.
    * TM propagates row-wise, so rows 0–11 stay `v0`, and rows 12–15 of
    * MB i carry the PREFIX SUM `v0 + S_{i−1}` (columns 0–11) and
    * `v0 + S_i` (columns 12–15), `S_i = Σ_{j≤i} m_j` — giving the
    * closed-form image sum `256·v0·k + Σ_{i≥1}(48·S_{i−1} + 16·S_i)`
    * the oracle replays. Exercises: the B_PRED keyframe sub-mode trees
    * with [above][left] contexts (RFC 6386 §11.4 probabilities), the
    * type-3 token path (no Y2), and TM sub-block prediction chaining
    * across reconstructed neighbors.
    */
  def q168Vp8Bpred(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"))
      .repartition(col("doc_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        val k = (2 + id % 6).toInt
        val mbs: Array[Vp8.StripMb] = Array.tabulate(k) { i =>
          if (i == 0) Vp8.DcMb((((id % 15) - 7) * 16).toInt)
          else Vp8.BPredTmMb(((((id + 7L * i) % 9) - 4) * 2).toInt)
        }
        val webp = Vp8.webpFromVp8(Vp8.encodeStrip(mbs))
        val img = Webp.decodeWebp(webp).get
        var sb = 0L; var sg = 0L; var sr = 0L
        var i = 0
        while (i < img.width * img.height) {
          sb += img.pixels(i * 3) & 0xff
          sg += img.pixels(i * 3 + 1) & 0xff
          sr += img.pixels(i * 3 + 2) & 0xff
          i += 1
        }
        (id, img.width.toLong, img.height.toLong, sb, sg, sr)
      })
      .toDF("doc_id", "width", "height", "sum_b", "sum_g", "sum_r")
      .orderBy(col("doc_id"))
  }

  /** q169: the VP8 LOOP FILTER on the oracle path — the q138 DC strip
    * (no skips) encoded at a per-document filter level `L = 1 + id mod
    * 63`. Flat MBs meet at vertical MB edges with step `t_i = v_i −
    * v_{i−1} = 2·raw_i`; the §15.3 normal filter fires iff `2|t| +
    * |t|/2 ≤ 3L + 4` (sharpness 0 ⇒ interior limit L, both sides flat
    * ⇒ no high-edge-variance) and then moves each boundary column by
    * the closed-form deltas `aⱼ = (54t+63)>>7, (36t+63)>>7,
    * (18t+63)>>7`. A whole-image sum is filter-BLIND (the filter
    * conserves p+q), so the probe weights each MB's row-0 sum by its
    * index: `wsum = Σ_i (i+1)·rowsum0_i = Σ(i+1)·16·v_i − Σ_{i≥1}
    * F(t_i)` with `F = a₁+a₂+a₃` — any filter slip (mask, limits,
    * taps, rounding, application order) shifts it. Interior edges and
    * chroma stay provably unchanged on flat content.
    */
  def q169Vp8LoopFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"))
      .repartition(col("doc_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        val k = (2 + id % 6).toInt
        val level = (1 + id % 63).toInt
        val mbs: Array[Vp8.StripMb] = Array.tabulate(k) { i =>
          Vp8.DcMb(((((id + 13L * i) % 15) - 7) * 16).toInt)
        }
        val webp = Vp8.webpFromVp8(Vp8.encodeStrip(mbs, level))
        val img = Webp.decodeWebp(webp).get
        var wsum = 0L
        var x = 0
        while (x < img.width) {
          wsum += (x / 16 + 1).toLong * (img.pixels(x * 3) & 0xff)
          x += 1
        }
        (id, img.width.toLong, img.height.toLong, level.toLong, wsum)
      })
      .toDF("doc_id", "width", "height", "flevel", "wsum")
      .orderBy(col("doc_id"))
  }
}
