package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal asset handling: media as opaque binary columns with typed
  * metadata structs, plus the decode / feature-extract / resize /
  * frame-sample pipeline a training-data platform runs over them.
  *
  * The container has no media codecs, so the DECODE STEP IS A DETERMINISTIC
  * STUB (byte-level pseudo-decoder) — everything around it is real Spark
  * plumbing: binary schema, per-partition batched iteration, typed feature
  * output that composes with SimilarityOps, and partition-preserving frame
  * explosion. A production build swaps `decodeBytes` for the actual codec
  * call; nothing else changes.
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

  /** STUB CODEC: deterministic byte-level pseudo-decode → 16-bin normalized
    * byte histogram as the "content features". Replace with a real decoder
    * (image pixels / audio samples / video frames) in production.
    */
  private[operators] def decodeBytes(payload: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](16)
    if (payload == null || payload.isEmpty) bins
    else {
      payload.foreach(b => bins((b & 0xFF) / 16) += 1f)
      val n = payload.length.toFloat
      bins.map(_ / n)
    }
  }

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
