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

  /** Resize stub: metadata transform + proportional payload truncation —
    * the plan shape (narrow projection, no shuffle) is what a real resize
    * kernel runs in.
    */
  def resize(assetDf: DataFrame, newWidth: Int, newHeight: Int): DataFrame = {
    val ratio = lit(newWidth * newHeight) / (col("width") * col("height")).cast("double")
    val newLen = greatest(lit(1),
      ceil(octet_length(col("payload")).cast("double") * ratio).cast("int"))
    assetDf
      .withColumn("payload", col("payload").substr(lit(1), newLen))
      .withColumn("width", lit(newWidth).cast("int"))
      .withColumn("height", lit(newHeight).cast("int"))
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
