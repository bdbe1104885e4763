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
  *  - index reads consider only COMMITTED batch dirs (a torn append's
  *    `_temporary` residue is invisible, not a schema-inference crash);
  *  - the flags step commits FIRST, computed against strictly pre-batch
  *    truth, and is witnessed by a per-batch file under the sink's
  *    `_markers/` dir (underscore-prefixed: invisible to parquet
  *    directory readers, so flag-free batches leave the sink readable).
  *    The marker gates the whole step on replay — without it, a crash
  *    after the index append would make the replay re-derive flags
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
  * OWNERSHIP: the index's `batch_id` namespace belongs to ONE streaming
  * query lineage (one checkpoint). Restarting against the same index with
  * a FRESH checkpoint restarts batch ids at 0, and surviving same-id dirs
  * would make the first-write-wins appends silently skip — resume from
  * the original checkpoint, or start a fresh index.
  *
  * Scale note: at this layout the per-batch candidate join shuffles the
  * standing `bands/` side too; a cluster deployment lays `bands/` out
  * bucketed by `band_key` (the BucketOps pattern) so only the arriving
  * batch shuffles. `gcIndex` bounds the index by dropping the oldest
  * generations (the windowed trade); `probeIndex` answers the ad-hoc
  * "already ingested?" question without mutating anything.
  */
object StreamNearDup {

  private def lshManifestJson(minhashK: Int, bands: Int, rowsPerBand: Int): String =
    s"""{"minhashK":$minhashK,"bands":$bands,"rowsPerBand":$rowsPerBand}"""

  /** Stamp-or-verify the index's LSH parameter manifest (crash-atomic
    * temp+rename; the same guard discipline as the sink's
    * `_bucketing.json` in CheckpointStream — any semantic change there
    * should be mirrored here). Refusals are loud in BOTH directions: a
    * manifest that disagrees with this run's parameters, and a
    * POPULATED manifest-less index (its entries were banded under unknown
    * parameters; stamping today's values over them would make the drift
    * permanently undetectable instead of failing the run).
    */
  private def checkLshManifest(
      fs: FileSystem, indexDir: Path,
      minhashK: Int, bands: Int, rowsPerBand: Int,
      stampIfAbsent: Boolean = true): Unit = {
    val mf = new Path(indexDir, "_lsh.json")
    val expected = lshManifestJson(minhashK, bands, rowsPerBand)
    def verify(): Unit = {
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
    }
    if (fs.exists(mf)) verify()
    else {
      val populated = Seq("bands", "sets").exists { part =>
        val p = new Path(indexDir, part)
        fs.exists(p) && fs.listStatus(p).nonEmpty
      }
      if (populated)
        throw new IllegalStateException(
          s"near-dup index $indexDir holds band/set entries but no _lsh.json " +
            "manifest: their LSH parameters are unknown and cross-batch detection " +
            s"against them cannot be trusted. Rebuild the index (expected $expected).")
      if (stampIfAbsent) {
        fs.mkdirs(indexDir)
        val tmp = new Path(indexDir, "._lsh.json.tmp")
        val out = fs.create(tmp, true)
        try out.write(expected.getBytes(StandardCharsets.UTF_8)) finally out.close()
        if (!fs.rename(tmp, mf)) {
          // rename-race loser: clean our tmp and VERIFY the winner's content
          // — two concurrent starts with different parameters must not share
          // one index just because the loser assumed the winner agreed
          fs.delete(tmp, true)
          if (!fs.exists(mf))
            throw new java.io.IOException(s"manifest publish failed: $mf")
          verify()
        }
      }
    }
  }

  /** Committed `batch_id=` generation dirs of one index part — ONE glob
    * listing (a per-dir `_SUCCESS` probe would cost O(batches) RPCs per
    * call). Shared by the per-batch guard, `probeIndex`, and `gcIndex`.
    */
  private[streaming] def committedDirs(
      fs: FileSystem, indexDir: String, part: String): Seq[String] =
    Option(fs.globStatus(new Path(s"$indexDir/$part/batch_id=*/_SUCCESS")))
      .toSeq.flatten.map(_.getPath.getParent.toString)

  /** Probe the standing index WITHOUT ingesting: near-dup flags for `docs`
    * against the committed index state only (no within-docs pairs, no
    * appends, nothing mutated — an absent or empty index probes empty, and
    * a populated manifest-less index is refused exactly as `run` would).
    * The ad-hoc "is this a near-copy of anything already ingested?" query.
    */
  def probeIndex(
      spark: SparkSession,
      indexDir: String,
      docs: DataFrame,
      threshold: Double = 0.9,
      minhashK: Int = 48,
      bands: Int = 16,
      rowsPerBand: Int = 3): DataFrame = {
    import spark.implicits._
    val idxPath = new Path(indexDir)
    val fs = idxPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    checkLshManifest(fs, idxPath, minhashK, bands, rowsPerBand, stampIfAbsent = false)
    val bandDirs = committedDirs(fs, indexDir, "bands")
    val setDirs = committedDirs(fs, indexDir, "sets")
    val hashed = DedupOps.hashedShingleSets(docs)
    if (bandDirs.isEmpty || setDirs.isEmpty)
      return Seq.empty[(Long, Long, Double)].toDF("doc_id", "dup_of", "jac")
    val bandsDf = DedupOps.bandedDocIds(hashed, minhashK, bands, rowsPerBand)
    bandsDf.as("b")
      .join(spark.read.parquet(bandDirs: _*).as("a"),
        col("a.band_key") === col("b.band_key"))
      .select(col("a.doc_id").as("dup_of"), col("b.doc_id").as("doc_id"))
      .distinct()
      .join(hashed.select(col("doc_id"), col("hs").as("hs_b")), Seq("doc_id"))
      .join(spark.read.parquet(setDirs: _*)
        .select(col("doc_id").as("dup_of"), col("hs").as("hs_a")), Seq("dup_of"))
      .withColumn("jac", DedupOps.jaccard(col("hs_a"), col("hs_b")))
      .filter(col("jac") >= threshold)
      .select(col("doc_id"), col("dup_of"), col("jac"))
  }

  /** Retention GC for the standing index: drop the OLDEST committed
    * generations beyond the newest `keepBatches`, bands and sets in
    * lockstep. Near-dups against dropped documents go undetected
    * afterwards — the same windowed trade as `StreamDedup`'s watermark
    * (global forever-dedup belongs to the batch path over the accumulated
    * corpus). OFFLINE utility: run with no active writer. Crash order per
    * generation is bands first — a surviving set without its band entries
    * is unreachable and harmless, while the reverse would silently drop
    * verified candidates.
    */
  def gcIndex(spark: SparkSession, indexDir: String, keepBatches: Int): Unit = {
    require(keepBatches >= 0, s"keepBatches must be non-negative: $keepBatches")
    val fs = new Path(indexDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def ids(part: String): Set[Long] =
      committedDirs(fs, indexDir, part)
        .map(p => new Path(p).getName.stripPrefix("batch_id=").toLong).toSet
    val common = (ids("bands") intersect ids("sets")).toSeq.sorted
    common.dropRight(keepBatches).foreach { id =>
      fs.delete(new Path(s"$indexDir/bands/batch_id=$id"), true)
      fs.delete(new Path(s"$indexDir/sets/batch_id=$id"), true)
    }
  }

  /** The flags sink's per-batch replay witness lives under `_markers/`
    * (underscore-prefixed: invisible to parquet directory readers, so a
    * run of flag-free batches cannot leave the sink unreadable the way
    * empty `batch_id=` dirs would). The marker commits AFTER the batch's
    * flag rows (if any) land, and gates the whole flags step on replay.
    */
  private def flagsMarker(dir: String, batchId: Long): Path =
    new Path(s"$dir/_markers/$batchId")

  private def commitFlagsMarker(fs: FileSystem, dir: String, batchId: Long): Unit = {
    val m = flagsMarker(dir, batchId)
    fs.mkdirs(m.getParent)
    if (!fs.exists(m)) { val o = fs.create(m, true); o.close() }
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
        val hconf = sp.sparkContext.hadoopConfiguration
        val fs = idxPath.getFileSystem(hconf)
        // sink and index may live on different filesystems
        val sinkFs = new Path(sinkDir).getFileSystem(hconf)
        // COMMITTED batch dirs only: existence of the parent (or a torn
        // `_temporary` residue from a crashed append) must not be read
        def idx(part: String, empty: => DataFrame): DataFrame =
          committedDirs(fs, indexDir, part) match {
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
            // the marker gates the WHOLE flags step: a replayed batch must
            // neither recompute flags against an index that already holds
            // its own entries (jaccard-1.0 self-duplicates) nor pay the
            // candidate join again
            if (!sinkFs.exists(flagsMarker(sinkDir, batchId))) {
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
                commitFlagsMarker(sinkFs, sinkDir, batchId)
              } finally { flagged.unpersist(); () }
            }
            CheckpointStream.appendDiffs(
              hashed.select(col("doc_id"), col("hs")), s"$indexDir/sets", batchId)
            CheckpointStream.appendDiffs(bandsDf, s"$indexDir/bands", batchId)
          } finally { bandsDf.unpersist(); () }
        } finally { hashed.unpersist(); () }
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow())
     else writer.trigger(Trigger.ProcessingTime("1 second"))).start()
  }
}
