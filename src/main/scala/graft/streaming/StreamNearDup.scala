package graft.streaming

import graft.operators.DedupOps
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming NEAR-dup detection at ingest — the MinHash-LSH counterpart of
  * `StreamDedup`'s exact hash dedup: every arriving document is checked
  * against everything seen BEFORE it (prior micro-batches via a standing
  * band index, earlier rows of its own batch via a self-join) and flagged
  * with the earlier document it near-duplicates at `threshold` Jaccard.
  * This is the guard a training-data ingest runs so near-copies never
  * accumulate in the corpus in the first place, rather than being swept by
  * a later batch q20/q36 pass.
  *
  * State = a persisted index under `indexDir`: `bands/` holds
  * (doc_id, band_key) LSH entries, `sets/` the hashed shingle sets used
  * for exact-Jaccard verification. Both grow by one append per
  * micro-batch through the same first-write-wins `batch_id=N` contract as
  * the diff sink (`CheckpointStream.appendDiffs`), so a replayed batch
  * neither double-indexes nor re-flags: flags commit FIRST (computed
  * against strictly pre-batch truth), sets before bands (a band entry
  * whose set is missing would silently drop a verified candidate; a set
  * without band entries is unreachable and harmless), and any crash makes
  * the restarted query replay the same batch id into `_SUCCESS`-guarded
  * dirs.
  *
  * Semantics match the batch operator exactly: candidates share an LSH
  * band bucket, verification is exact Jaccard over the same
  * `hashedShingleSets`, and "earlier" is arrival order across batches /
  * doc_id order within one (the batch operator's `doc_a < doc_b`
  * orientation) — parity-tested flag-for-flag against `minhashNearDup`
  * over the accumulated feed.
  *
  * Scale note: at this layout the per-batch candidate join shuffles the
  * standing `bands/` side too; a cluster deployment lays `bands/` out
  * bucketed by `band_key` (the BucketOps pattern) so only the arriving
  * batch shuffles, and ages entries out with the same retention policy as
  * the diff sink.
  */
object StreamNearDup {

  def run(
      spark: SparkSession,
      sourceDir: String,
      checkpointDir: String,
      sinkDir: String,
      indexDir: String,
      threshold: Double = 0.9,
      minhashK: Int = 48,
      bands: Int = 16,
      rowsPerBand: Int = 3,
      maxFilesPerTrigger: Int = 1,
      availableNow: Boolean = true,
      schemaHint: Option[StructType] = None): StreamingQuery = {
    require(bands * rowsPerBand == minhashK, "bands*rowsPerBand must equal minhashK")
    val raw = spark.readStream
      .schema(schemaHint.getOrElse(spark.read.parquet(sourceDir).schema))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
    val writer = raw.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sp = batch.sparkSession
        import sp.implicits._
        val hconf = sp.sparkContext.hadoopConfiguration
        val fs = new Path(indexDir).getFileSystem(hconf)
        // shared head with the batch operator: same shingles, same hashes
        val hashed = DedupOps.hashedShingleSets(batch).persist()
        try {
          val bandsDf = hashed
            .withColumn("sig",
              DedupOps.minhashSignatureFromHashes(col("hs"), minhashK))
            .withColumn("band_key",
              explode(DedupOps.bandKeys(col("sig"), bands, rowsPerBand)))
            .select(col("doc_id"), col("band_key"))
            .persist()
          try {
            def idx(part: String, empty: => DataFrame): DataFrame =
              if (fs.exists(new Path(s"$indexDir/$part")))
                sp.read.parquet(s"$indexDir/$part") else empty
            val idxBands = idx("bands", Seq.empty[(Long, Long)].toDF("doc_id", "band_key"))
            val idxSets = idx("sets", Seq.empty[(Long, Array[Long])].toDF("doc_id", "hs"))
            // earlier-seen candidates (index) + earlier-in-batch candidates
            val seenCand = bandsDf.as("b")
              .join(idxBands.as("a"), col("a.band_key") === col("b.band_key"))
              .select(col("a.doc_id").as("dup_of"), col("b.doc_id").as("doc_id"))
            val withinCand = bandsDf.as("a")
              .join(bandsDf.as("b"),
                col("a.band_key") === col("b.band_key") &&
                  col("a.doc_id") < col("b.doc_id"))
              .select(col("a.doc_id").as("dup_of"), col("b.doc_id").as("doc_id"))
            val cand = seenCand.unionByName(withinCand).distinct()
            val setsAll = idxSets.select(col("doc_id"), col("hs"))
              .unionByName(hashed.select(col("doc_id"), col("hs")))
            val flagged = cand
              .join(hashed.select(col("doc_id"), col("hs").as("hs_b")), Seq("doc_id"))
              .join(setsAll.select(col("doc_id").as("dup_of"), col("hs").as("hs_a")),
                Seq("dup_of"))
              .withColumn("jac", DedupOps.jaccard(col("hs_a"), col("hs_b")))
              .filter(col("jac") >= threshold)
              .select(col("doc_id"), col("dup_of"), col("jac"))
              .persist()
            try {
              // flags first (pre-batch truth), then sets, then bands — see
              // the crash-ordering argument in the scaladoc
              if (!flagged.isEmpty)
                CheckpointStream.appendDiffs(flagged, sinkDir, batchId)
              CheckpointStream.appendDiffs(
                hashed.select(col("doc_id"), col("hs")), s"$indexDir/sets", batchId)
              CheckpointStream.appendDiffs(bandsDf, s"$indexDir/bands", batchId)
            } finally { flagged.unpersist(); () }
          } finally { bandsDf.unpersist(); () }
        } finally { hashed.unpersist(); () }
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow())
     else writer.trigger(Trigger.ProcessingTime("1 second"))).start()
  }
}
