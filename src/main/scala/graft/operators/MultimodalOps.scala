package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets

/** Multimodal asset handling: media as opaque binary columns with typed
  * metadata structs, plus the decode / feature-extract / resize /
  * frame-sample pipeline a training-data platform runs over them.
  *
  * The decode step carries REAL dependency-free codecs for two container
  * formats — uncompressed 24-bpp Windows BMP (`decodeBmp`) and PCM WAV
  * (`decodeWav`), both parsed from their public header layouts — with a
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
    * rows are excluded — the engine ships no video codec, and a fallback
    * row would test nothing.
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
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var data: Option[(Int, Int)] = None // (offset, length)
    while (o + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val id = new String(b, o, 4, StandardCharsets.US_ASCII)
      val sz = le32(b, o + 4)
      if (sz < 0 || o + 8 + sz.toLong > b.length) return None
      if (id == "fmt " && sz >= 16) {
        if (le16(b, o + 8) != 1) return None // integer PCM only
        fmt = Some((le16(b, o + 10), le32(b, o + 12), le16(b, o + 22)))
      } else if (id == "data") data = Some((o + 8, sz))
      o += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    for {
      (ch, rate, bits) <- fmt
      (doff, dlen) <- data
      if ch > 0 && rate > 0 && (bits == 8 || bits == 16)
    } yield {
      val n = if (bits == 16) dlen / 2 else dlen
      val out = new Array[Float](n)
      var i = 0
      while (i < n) {
        out(i) =
          if (bits == 16) le16(b, doff + 2 * i).toShort / 32768f
          else ((b(doff + i) & 0xFF) - 128) / 128f
        i += 1
      }
      WavAudio(rate, ch, bits, out)
    }
  }

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

  /** Content features, 16 floats for every modality (uniform schema so the
    * feature column composes with SimilarityOps regardless of media type):
    *  - BMP:  [width, height, meanB, meanG, meanR] ++ 11-bin gray histogram
    *  - WAV:  [rate, channels, nSamples, rms, zeroCrossings] ++ 11-bin
    *    amplitude histogram
    *  - else: the 16-bin byte histogram fallback.
    * Dispatch is by magic bytes; parse failures fall through — one garbled
    * asset degrades to fallback features instead of failing the batch.
    */
  private[operators] def decodeBytes(payload: Array[Byte]): Array[Float] =
    // belt-and-suspenders: the parsers return None on everything the
    // bounds checks anticipate, and the catch guarantees the never-throw
    // contract even for a shape they did not — one garbled asset must
    // never kill a partition
    try decodeBmp(payload).map(imageFeatures)
      .orElse(decodeWav(payload).map(audioFeatures))
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

  /** Resize over the asset table: decodable BMP payloads get a REAL
    * nearest-neighbor resample and are re-encoded as BMP; everything else
    * (audio, video, text stand-ins) keeps the metadata-plus-proportional-
    * truncation behavior — a non-image payload has no pixel grid to
    * resample, but the byte budget should still track the metadata shrink.
    * Plan shape: one narrow mapPartitions over the asset columns, no
    * shuffle — the same shape the stub ran in, now with a real kernel.
    */
  def resize(assetDf: DataFrame, newWidth: Int, newHeight: Int): DataFrame = {
    require(newWidth > 0 && newHeight > 0, "resize target must be positive")
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
                  resampleNearest(img, newWidth, newHeight)),
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
}
