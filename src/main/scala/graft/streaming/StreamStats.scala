package graft.streaming

import graft.operators.TextOps
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming corpus statistics: the q54/q73 exact token-length profile
  * maintained CONTINUOUSLY over an arriving document stream. The whole
  * trick is the round-11 histogram rework: `CountHistogram` is a plain
  * aggregate, so a streaming `groupBy(lang)` keeps ONE state row per
  * language holding the exact `(n_tokens, count)` histogram — state
  * bounded by the token-count DOMAIN, not the stream length — and the
  * shared `profileFromHistogram` projection reads exact index-rule
  * percentiles off it every trigger. The r10 window/sort formulation is
  * not expressible on a stream at all (rank windows are unsupported), and
  * an `approx_percentile` stream would surrender exactness; this keeps
  * both. Drained output equals the batch q54/q73 over the same rows
  * (`StreamStatsSpec`).
  */
object StreamStats {

  /** Per-language exact length profile of a streaming `documents` frame
    * (`lang`, `text` columns). Complete-mode aggregation: emit with
    * `outputMode("complete")`.
    */
  def lengthProfile(docs: DataFrame): DataFrame =
    TextOps.profileFromHistogram(TextOps.tokenHistogram(docs))

  /** Composed-lifecycle runner (`Pipeline` wires this over the documents
    * feed): maintain the exact profile continuously and publish ONE
    * parquet snapshot per micro-batch under `outDir/gen_<batchId>` via
    * tmp-dir + rename (the standing-index publish discipline — a reader
    * never sees a half-written generation, a crashed trigger leaves the
    * previous one intact, and a replayed batch id overwrites cleanly).
    * Only the newest snapshot matters, so retention keeps the latest two
    * generations (one predecessor for a reader mid-scan) and deletes the
    * rest — the sink stays O(profile), not O(stream). A feed without a
    * `lang` column profiles as one corpus-wide group (`lang = "all"`).
    */
  def run(
      spark: SparkSession,
      sourceDir: String,
      checkpointDir: String,
      outDir: String,
      maxFilesPerTrigger: Int = 1,
      availableNow: Boolean = true,
      schemaHint: Option[StructType] = None): StreamingQuery = {
    val raw = spark.readStream
      .schema(schemaHint.getOrElse(spark.read.parquet(sourceDir).schema))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
    val docs =
      if (raw.columns.contains("lang")) raw.select(col("lang"), col("text"))
      else raw.select(lit("all").as("lang"), col("text"))
    val writer = lengthProfile(docs).writeStream
      .outputMode("complete")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        publishSnapshot(batch, outDir, batchId)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  private def publishSnapshot(batch: DataFrame, outDir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val root = new Path(outDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(
      s"$outDir/gen_$batchId.tmp-" + java.util.UUID.randomUUID().toString.take(8))
    // the profile is O(languages) rows — one file is the right layout
    batch.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val fin = new Path(s"$outDir/gen_$batchId")
    if (fs.exists(fin)) fs.delete(fin, true) // replayed batch id: last write wins
    if (!fs.rename(tmp, fin))
      throw new java.io.IOException(s"profile snapshot publish failed: $tmp")
    fs.listStatus(root).map(_.getPath)
      .filter(_.getName.matches("gen_\\d+"))
      .sortBy(_.getName.stripPrefix("gen_").toLong)
      .dropRight(2)
      .foreach(p => fs.delete(p, true))
  }

  /** Per-language standing VOCABULARY profile: the portable HLL sketch
    * (q97) over the token stream — distinct-vocabulary cardinality per
    * language from ONE 256-byte state row each, where exact streaming
    * `count(distinct token)` state would grow with every new token
    * forever. Emits the q97 derivation (`s_scaled`, `n_zero`,
    * `reg_digest`, `hll_estimate`), so the published snapshot is
    * mergeable evidence, not just a number. Complete-mode aggregation.
    */
  def vocabSketch(docs: DataFrame): DataFrame =
    graft.operators.SkewOps.hllDistinct(
      docs.select(col("lang"),
        explode(split(lower(col("text")), " ")).as("v")),
      "lang", "v")

  /** Composed-lifecycle runner for the vocabulary sketch: identical
    * snapshot discipline to [[run]], published under its own dir. */
  def runVocab(
      spark: SparkSession,
      sourceDir: String,
      checkpointDir: String,
      outDir: String,
      maxFilesPerTrigger: Int = 1,
      availableNow: Boolean = true,
      schemaHint: Option[StructType] = None): StreamingQuery = {
    val raw = spark.readStream
      .schema(schemaHint.getOrElse(spark.read.parquet(sourceDir).schema))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
    val docs =
      if (raw.columns.contains("lang")) raw.select(col("lang"), col("text"))
      else raw.select(lit("all").as("lang"), col("text"))
    val writer = vocabSketch(docs).writeStream
      .outputMode("complete")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        publishSnapshot(batch, outDir, batchId)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  /** The CURRENT profile: newest complete snapshot generation. */
  def readProfile(spark: SparkSession, outDir: String): DataFrame = {
    val root = new Path(outDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val gens = fs.listStatus(root).map(_.getPath.getName)
      .filter(_.matches("gen_\\d+")).map(_.stripPrefix("gen_").toLong)
    require(gens.nonEmpty, s"no profile snapshot published under $outDir")
    spark.read.parquet(s"$outDir/gen_${gens.max}")
  }
}
