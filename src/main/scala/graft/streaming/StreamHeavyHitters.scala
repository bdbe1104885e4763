package graft.streaming

import graft.functions.CmsSketch
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Continuous heavy hitters: the top-k most frequent tokens per language
  * over an UNBOUNDED vocabulary with BOUNDED state — the composition the
  * sketch family exists for. Exact streaming counts need one state row
  * per distinct token forever; the exact `CountHistogram` stream (q73's
  * lane) bounds state by the VALUE DOMAIN, which a token vocabulary
  * doesn't have. This lane keeps, per language:
  *
  *   - the standing Count-Min counters (8 KB — every token occurrence
  *     ever seen is folded in, by the same md5 arithmetic as
  *     [[graft.functions.CmsSketch]], so counts never undercount);
  *   - a candidate map of at most `2k` tokens, re-scored against the
  *     UPDATED sketch each batch and pruned to the top `2k` by
  *     (estimate DESC, token ASC).
  *
  * DETERMINISTIC batch semantics (order-free, so shuffle order cannot
  * change results): each trigger first folds ALL of the batch's
  * occurrences into the counters, then scores previous-candidates ∪
  * batch-distinct-tokens against the final counters. The approximation
  * contract is the standard CMS+heap one, stated honestly: estimates are
  * one-sided (≥ true count, q98's guarantee), but a token pruned from
  * the candidate set while small is only rediscovered in batches where
  * it reappears — a long-tail token that grows ONLY while absent from
  * candidates can be missed. The spec pins the regime that matters
  * (skewed streams: recovered top-k == exact top-k) and the sketch leg
  * exactly (streamed counters == batch counters, bit-for-bit).
  *
  * Each trigger appends the current top-k to `outDir/batch_id=N`;
  * [[readHeavyHitters]] resolves the newest generation per language.
  */
object StreamHeavyHitters {

  private[graft] case class TokenRow(lang: String, token: String)

  private[graft] case class HhState(counters: Array[Long], candidates: Map[String, Long])

  private[graft] case class HhRow(lang: String, rank: Int, token: String, est_count: Long)

  private[graft] def estimate(counters: Array[Long], token: String): Long = {
    val bytes = token.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    (0 until CmsSketch.Depth)
      .map(r => counters(r * CmsSketch.Width + CmsSketch.column(r, bytes)))
      .min
  }

  /** Order-free batch step: fold all occurrences, then score and prune. */
  private[graft] def advance(
      st: HhState, tokens: Seq[String], k: Int): HhState = {
    val counters =
      if (st.counters.isEmpty) new Array[Long](CmsSketch.Depth * CmsSketch.Width)
      else st.counters.clone()
    for (t <- tokens; r <- 0 until CmsSketch.Depth) {
      val bytes = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      counters(r * CmsSketch.Width + CmsSketch.column(r, bytes)) += 1L
    }
    val scored = (st.candidates.keySet ++ tokens)
      .map(t => t -> estimate(counters, t)).toSeq
      .sortBy { case (t, est) => (-est, t) }
      .take(2 * k)
    HhState(counters, scored.toMap)
  }

  private[graft] def topK(st: HhState, lang: String, k: Int): Seq[HhRow] =
    st.candidates.toSeq
      .sortBy { case (t, est) => (-est, t) }
      .take(k).zipWithIndex
      .map { case ((t, est), i) => HhRow(lang, i + 1, t, est) }

  private[graft] def hitterUpdates(
      tokens: Dataset[TokenRow], k: Int): Dataset[HhRow] = {
    import tokens.sparkSession.implicits._
    tokens.groupByKey(_.lang)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout()) {
        (lang: String, it: Iterator[TokenRow], state: GroupState[HhState]) =>
          val prev = state.getOption
            .getOrElse(HhState(Array.emptyLongArray, Map.empty))
          val next = advance(prev, it.map(_.token).toSeq, k)
          state.update(next)
          topK(next, lang, k).iterator
      }
  }

  def run(
      spark: SparkSession,
      sourceDir: String,
      checkpointDir: String,
      outDir: String,
      k: Int = 10,
      maxFilesPerTrigger: Int = 1,
      availableNow: Boolean = true,
      schemaHint: Option[StructType] = None): StreamingQuery = {
    import spark.implicits._
    val raw = spark.readStream
      .schema(schemaHint.getOrElse(spark.read.parquet(sourceDir).schema))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
    val docs =
      if (raw.columns.contains("lang")) raw.select(col("lang"), col("text"))
      else raw.select(lit("all").as("lang"), col("text"))
    val tokens = docs
      .select(col("lang"), explode(split(lower(col("text")), " ")).as("token"))
      .as[TokenRow]
    val writer = hitterUpdates(tokens, k).toDF().writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) CheckpointStream.appendDiffs(batch, outDir, batchId)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  /** The CURRENT top-k: each language's newest committed generation. */
  def readHeavyHitters(spark: SparkSession, outDir: String): DataFrame = {
    val root = new Path(outDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(root), s"no heavy-hitter output under $outDir")
    val all = spark.read.parquet(outDir)
    val latest = all.groupBy(col("lang")).agg(max(col("batch_id")).as("batch_id"))
    all.join(latest, Seq("lang", "batch_id"))
      .select(col("lang"), col("rank"), col("token"), col("est_count"))
  }
}
