package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

import java.nio.charset.StandardCharsets

/** Shared index/checkpoint OWNERSHIP stamp for the standing-index
  * streams (`StreamNearDup`, `StreamEmbedIndex`): an index's `batch_id`
  * namespace belongs to ONE streaming-query lineage, and `_owner.json`
  * (the owning checkpoint's qualified URI) makes that binding explicit
  * on disk.
  *
  * Why the commit-lead check alone is not enough: it admits any index
  * whose newest generation is ≤ lastCommit+1, so a ONE-generation index
  * paired with a genuinely fresh checkpoint is indistinguishable from a
  * crash-before-first-commit replay. For the near-dup guard that window
  * re-derives flags against an index holding the batch's own entries
  * (jaccard-1.0 self-duplicates); for the embedding feeder it is worse —
  * the fresh stream's batch 0 hits the base's fold watermark
  * (`batchId <= foldedThrough`) and is SILENTLY DROPPED: data loss, not
  * just wrong flags.
  *
  * Protocol (both streams): verify the stamp when present (loud refusal
  * with a relocation escape hatch — delete the stamp to re-adopt); run
  * the stream's own commit-lead check; after admission, stamp if absent
  * (fresh index, or a legacy stamp-less one being adopted by its first
  * admitted run). The write is crash-atomic temp+rename; the rename-race
  * loser verifies the winner, so two checkpoints racing to adopt cannot
  * both win.
  */
private[streaming] object OwnerStamp {

  private def expectedJson(spark: SparkSession, checkpointDir: String): String = {
    val p = new Path(checkpointDir)
    val qualified = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(p).toString
    val esc = qualified.replace("\\", "\\\\").replace("\"", "\\\"")
    s"""{"checkpoint":"$esc"}"""
  }

  /** Stamp location for an index whose lifecycle only ever writes INSIDE
    * its directory (the guard's bands/sets appends): the stamp rides in
    * the dir itself.
    */
  def inside(indexDir: String): Path =
    new Path(new Path(indexDir), "_owner.json")

  /** Stamp location for an index whose lifecycle REPLACES its directory
    * wholesale (the embedding index's rename-swap base publish/fold): a
    * stamp inside would be retired with the old generation, so it lives
    * BESIDE the dir. The sibling name shares the dir's prefix but matches
    * neither the `.tmp-` nor `.old-` sweep patterns.
    */
  def beside(indexDir: String): Path =
    new Path(indexDir + "._owner.json")

  /** Refuse loudly if the stamp exists and names another checkpoint. */
  def verify(
      spark: SparkSession, fs: FileSystem, stamp: Path, indexDir: String,
      checkpointDir: String): Unit = {
    if (!fs.exists(stamp)) return
    val expected = expectedJson(spark, checkpointDir)
    val buf = new Array[Byte](fs.getFileStatus(stamp).getLen.toInt)
    val in = fs.open(stamp)
    try in.readFully(buf) finally in.close()
    val found = new String(buf, StandardCharsets.UTF_8)
    if (found.trim != expected)
      throw new IllegalStateException(
        s"standing index $indexDir is owned by checkpoint $found but this run " +
          s"uses $expected — this checkpoint does not own the index's batch_id " +
          "namespace. Resume from the index's original checkpoint, start a " +
          "fresh index, or (if the checkpoint was legitimately relocated) " +
          s"delete $stamp to let the new location adopt the index.")
  }

  /** Foreign-adoption guard for LEGACY (stamp-less) indexes: a PRISTINE
    * checkpoint — one that has never even started a batch (no `offsets/`
    * entries) — cannot be the lineage that wrote a populated index, so
    * letting it adopt would both corrupt its replayed batch 0 AND lock
    * the true owner out behind the stolen stamp. The true owner is never
    * caught by this: even a crash before the very first commit leaves
    * `offsets/0` behind (the offset log is written before the batch
    * runs). Callers invoke this before `adoptIfAbsent` whenever the
    * index already holds data.
    */
  def refuseForeignAdoption(
      spark: SparkSession, fs: FileSystem, stamp: Path, indexDir: String,
      checkpointDir: String): Unit = {
    if (fs.exists(stamp)) return
    val offsets = new Path(s"$checkpointDir/offsets")
    val cfs = offsets.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val started = cfs.exists(offsets) && cfs.listStatus(offsets)
      .exists(s => s.getPath.getName.forall(_.isDigit))
    if (!started)
      throw new IllegalStateException(
        s"standing index $indexDir holds data but checkpoint $checkpointDir has " +
          "never started a batch — this checkpoint cannot be the lineage that " +
          "wrote the index, and adopting it would corrupt the replayed batch 0 " +
          "and lock out the true owner. Resume from the index's original " +
          "checkpoint, or start a fresh index.")
  }

  /** Adopt the index for `checkpointDir` if it carries no stamp yet.
    * Callers invoke this only AFTER their admission checks passed.
    */
  def adoptIfAbsent(
      spark: SparkSession, fs: FileSystem, stamp: Path, indexDir: String,
      checkpointDir: String): Unit = {
    if (fs.exists(stamp)) return
    val expected = expectedJson(spark, checkpointDir)
    fs.mkdirs(stamp.getParent)
    val tmp = new Path(stamp.getParent, "." + stamp.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(expected.getBytes(StandardCharsets.UTF_8)) finally out.close()
    if (!fs.rename(tmp, stamp)) {
      fs.delete(tmp, true)
      if (!fs.exists(stamp))
        throw new java.io.IOException(s"owner stamp publish failed: $stamp")
      verify(spark, fs, stamp, indexDir, checkpointDir)
    }
  }
}
