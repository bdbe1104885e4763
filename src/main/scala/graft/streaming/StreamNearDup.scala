package graft.streaming

import graft.operators.DedupOps
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import java.nio.charset.StandardCharsets

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
  * (doc_id, band_key) LSH entries — derived by the SAME
  * `DedupOps.bandedDocIds` head as the batch operator, so the two cannot
  * drift — and `sets/` the hashed shingle sets for exact-Jaccard
  * verification. Both grow by one `batch_id=N` append per micro-batch.
  *
  * Replay discipline (all via `_SUCCESS` first-write-wins):
  *  - reads consider only COMMITTED batch dirs (a torn append's
  *    `_temporary` residue is invisible, not a schema-inference crash);
  *  - flags commit FIRST, computed against strictly pre-batch truth, and
  *    an empty flag set still commits a marker-only dir — without it, a
  *    crash after the index append would make the replay re-derive flags
  *    against an index that already contains the batch's own entries
  *    (every doc a Jaccard-1.0 "duplicate" of itself);
  *  - sets commit before bands: a band entry whose set is missing would
  *    silently drop a verified candidate, while a set without band
  *    entries is unreachable and harmless.
  *
  * The index self-describes its LSH parameters (`_lsh.json`, stamped
  * crash-atomically on first use and verified on every later run): band
  * keys from different (minhashK, bands, rowsPerBand) are incomparable,
  * and a parameter drift would otherwise silently flag NOTHING against
  * all pre-restart documents instead of failing loudly.
  *
  * Scale note: at this layout the per-batch candidate join shuffles the
  * standing `bands/` side too; a cluster deployment lays `bands/` out
  * bucketed by `band_key` (the BucketOps pattern) so only the arriving
  * batch shuffles, and ages entries out with the same retention policy as
  * the diff sink.
  */
object StreamNearDup {

  private def lshManifestJson(minhashK: Int, bands: Int, rowsPerBand: Int): String =
    s"""{"minhashK":$minhashK,"bands":$bands,"rowsPerBand":$rowsPerBand}"""

  /** Stamp-or-verify the index's LSH parameter manifest (crash-atomic
    * temp+rename, same pattern as the sink bucketing manifest).
    */
  private def checkLshManifest(
      fs: FileSystem, indexDir: Path,
      minhashK: Int, bands: Int, rowsPerBand: Int): Unit = {
    val mf = new Path(indexDir, "_lsh.json")
    val expected = lshManifestJson(minhashK, bands, rowsPerBand)
    if (fs.exists(mf)) {
      val buf = new Array[Byte](fs.getFileStatus(mf).getLen.toInt)
      val in = fs.open(mf)
      try in.readFully(buf) finally in.close()
      val found = new String(buf, StandardCharsets.UTF_8)
      if (found.trim != expected)
        throw new IllegalStateException(
          s"near-dup index $indexDir was built with LSH parameters $found but this " +
            s"run uses $expected — band keys are incomparable across parameters and " +
            "cross-batch detection would silently miss everything. Rebuild the index " +
            "or match the parameters.")
    } else {
      fs.mkdirs(indexDir)
      val tmp = new Path(indexDir, "._lsh.json.tmp")
      val out = fs.create(tmp, true)
      try out.write(expected.getBytes(StandardCharsets.UTF_8)) finally out.close()
      if (!fs.rename(tmp, mf) && !fs.exists(mf))
        throw new java.io.IOException(s"manifest publish failed: $mf")
    }
  }

  /** Commit a marker-only batch dir: the first-write-wins witness for a
    * batch that produced no rows (see the replay discipline above).
    */
  private def commitEmpty(fs: FileSystem, dir: String, batchId: Long): Unit = {
    val d = new Path(s"$dir/batch_id=$batchId")
    fs.mkdirs(d)
    val ok = new Path(d, "_SUCCESS")
    if (!fs.exists(ok)) { val o = fs.create(ok, true); o.close() }
  }

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
    val idxPath = new Path(indexDir)
    checkLshManifest(
      idxPath.getFileSystem(spark.sparkContext.hadoopConfiguration),
      idxPath, minhashK, bands, rowsPerBand)
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
        val fs = idxPath.getFileSystem(sp.sparkContext.hadoopConfiguration)
        // COMMITTED batch dirs only: existence of the parent (or a torn
        // `_temporary` residue from a crashed append) must not be read
        def committed(part: String): Seq[String] = {
          val p = new Path(s"$indexDir/$part")
          if (!fs.exists(p)) Seq.empty
          else fs.listStatus(p).map(_.getPath)
            .filter(d => d.getName.startsWith("batch_id=") &&
              fs.exists(new Path(d, "_SUCCESS")))
            .map(_.toString).toSeq
        }
        def idx(part: String, empty: => DataFrame): DataFrame =
          committed(part) match {
            case Seq() => empty
            case dirs  => sp.read.parquet(dirs: _*)
          }
        // shared head with the batch operator: same shingles, same hashes,
        // same signature/band derivation
        val hashed = DedupOps.hashedShingleSets(batch).persist()
        try {
          val bandsDf = DedupOps.bandedDocIds(hashed, minhashK, bands, rowsPerBand)
            .persist()
          try {
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
              // commit order is load-bearing — see the replay discipline
              if (!flagged.isEmpty)
                CheckpointStream.appendDiffs(flagged, sinkDir, batchId)
              else commitEmpty(fs, sinkDir, batchId)
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
