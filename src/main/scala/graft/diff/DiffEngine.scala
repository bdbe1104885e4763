package graft.diff

import com.fasterxml.jackson.databind.ObjectMapper
import graft.diff.DiffModel._

import java.nio.charset.StandardCharsets

/** The diff operator (SURVEY.md §2.3 D5–D10): full-outer key diff over two
  * per-task checkpoint maps, Myers line diff of canonicalized content for
  * keys present on both sides, whole-value insert/remove for added/dropped
  * keys, empty-diff filtering, and the inverse (apply) operator.
  *
  * Semantics mirror the reference engine (`service/DiffService.java:82-259`)
  * with the line separator pinned to `\n` and charset pinned to UTF-8
  * (the reference uses platform defaults; we run Linux/UTF-8 — documented
  * divergence, byte-identical on the target platform).
  */
object DiffEngine {

  private val LineSep = "\n"

  // Jackson's ObjectMapper is thread-safe after configuration; one per JVM.
  @transient private lazy val mapper = new ObjectMapper()

  /** JSON canonicalization (D7, reference `DiffService.java:227-240`): parse
    * as JSON and re-serialize with Jackson's default pretty printer (2-space
    * object indent, inline arrays, `" : "` separators) so semantically-equal
    * JSON always yields the same line split; non-JSON content falls back to
    * a raw line split. Note (faithful to the reference's plain
    * ObjectMapper): trailing tokens are ignored, so a concatenation of
    * multiple JSON documents canonicalizes to the FIRST document.
    */
  def canonicalLines(content: String): Vector[String] =
    try {
      val parsed = mapper.readValue(content, classOf[Object])
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(parsed)
        .split(LineSep).toVector
    } catch {
      case _: com.fasterxml.jackson.core.JacksonException =>
        content.split(LineSep).toVector
    }

  private def decode(cd: CheckpointData): String =
    new String(cd.checkpoint, StandardCharsets.UTF_8)

  /** D8: a task's content is the ts-sorted concatenation of its checkpoint
    * strings (reference `DiffService.java:254-259`).
    */
  private def concatSorted(cds: Seq[CheckpointData]): String =
    cds.sortBy(_.checkpointNs).map(decode).mkString

  /** D9: whole-value add — one insert per checkpoint (raw line split, range
    * (0, nLines)), each stamped with its own event time
    * (reference `DiffService.java:143-150`).
    */
  private def wholeAdd(cds: Seq[CheckpointData]): Vector[ContentChange] =
    cds.map { cd =>
      val lines = decode(cd).split(LineSep).toVector
      ContentChange(Content.Insert(DiffRange(0, lines.length), lines), cd.checkpointNs)
    }.toVector

  /** D9: whole-value remove — `(0, nLines)` with empty lines
    * (reference `DiffService.java:167-174`).
    */
  private def wholeRemove(cds: Seq[CheckpointData]): Vector[ContentChange] =
    cds.map { cd =>
      val lines = decode(cd).split(LineSep).toVector
      ContentChange(Content.Remove(DiffRange(0, lines.length), Vector.empty), cd.checkpointNs)
    }.toVector

  /** D6: Myers line diff of two same-key task states, each stamped with the
    * max event-time across both sides (reference `DiffService.java:179-225`).
    */
  def contentChanges(prev: Seq[CheckpointData], curr: Seq[CheckpointData]): Vector[ContentChange] = {
    // maxOption: both sides empty is representable through the public
    // computeDiff API (task key present with no checkpoints); the reference
    // logs and continues rather than throwing
    val ts = (prev.iterator ++ curr.iterator).map(_.checkpointNs).maxOption.getOrElse(0L)
    val left = canonicalLines(concatSorted(prev))
    val right = canonicalLines(concatSorted(curr))
    Myers.diff(left, right).iterator.map {
      case Myers.ChangeDelta(srcPos, srcLines, tgtPos, tgtLines) =>
        ContentChange(
          Content.Replace(
            Content.Remove(DiffRange(srcPos, srcLines.length), Vector.empty),
            Content.Insert(DiffRange(tgtPos, tgtLines.length), tgtLines)),
          ts)
      case Myers.DeleteDelta(srcPos, srcLines, _) =>
        ContentChange(Content.Remove(DiffRange(srcPos, srcLines.length), Vector.empty), ts)
      case Myers.InsertDelta(_, tgtPos, tgtLines) =>
        ContentChange(Content.Insert(DiffRange(tgtPos, tgtLines.length), tgtLines), ts)
    }.toVector
  }

  /** D5 + D10: full-outer key diff over previous/current task maps; tasks
    * with no changes are dropped; an all-empty diff yields None
    * (reference `DiffService.java:82-126`, `:47-57`).
    */
  def computeDiff(
      previous: Map[String, Seq[CheckpointData]],
      current: Map[String, Seq[CheckpointData]],
      sequenceNumber: Int): Option[CheckpointDataDiff] = {
    val allKeys = previous.keySet ++ current.keySet
    val diffData = allKeys.iterator.flatMap { key =>
      val changes = (previous.get(key), current.get(key)) match {
        case (None, Some(curr))       => wholeAdd(curr)
        case (Some(prev), None)       => wholeRemove(prev)
        case (Some(prev), Some(curr)) => contentChanges(prev, curr)
        case (None, None)             => Vector.empty // unreachable: key from union
      }
      if (changes.isEmpty) None else Some(key -> DiffItem(changes, key))
    }.toMap
    if (diffData.isEmpty) None else Some(CheckpointDataDiff(sequenceNumber, diffData))
  }

  /** Inverse operator: apply one task's change list to its before-lines.
    * Changes must be in ascending positional order (as produced by
    * `contentChanges`). Ranges are `(start, size)`; a pure insert carries a
    * *target* position, converted back to a source position via the running
    * length delta. This realizes the reconstruct-after semantics the
    * reference documents in its test helper
    * (`DiffServiceTest.java:134-239`, with the range arithmetic corrected
    * to the `(start, size)` meaning the fixtures encode).
    */
  def applyChanges(before: IndexedSeq[String], changes: Seq[ContentChange]): Vector[String] = {
    val out = Vector.newBuilder[String]
    var produced = 0 // target lines emitted so far
    var srcIdx = 0
    def copyTo(srcPos: Int): Unit = {
      while (srcIdx < srcPos && srcIdx < before.length) {
        out += before(srcIdx); srcIdx += 1; produced += 1
      }
    }
    changes.foreach { cc =>
      cc.change match {
        case Content.Insert(r, lines) =>
          copyTo(r.start - (produced - srcIdx)) // target pos → source pos
          out ++= lines; produced += lines.length
        case Content.Remove(r, _) =>
          copyTo(r.start)
          srcIdx += r.size
        case Content.Replace(Content.Remove(r, _), Content.Insert(_, lines)) =>
          copyTo(r.start)
          srcIdx += r.size
          out ++= lines; produced += lines.length
      }
    }
    copyTo(before.length)
    out.result()
  }

  /** Apply a whole diff document to a before-state of task → content lines,
    * returning the reconstructed after-state. Task-level adds materialize
    * new tasks; a remove spanning the entire task deletes it.
    */
  def applyDiff(
      before: Map[String, Vector[String]],
      diff: CheckpointDataDiff): Map[String, Vector[String]] = {
    diff.diffData.foldLeft(before) { case (state, (task, item)) =>
      state.get(task) match {
        case None =>
          // whole-task add: concatenate the per-checkpoint inserts in order
          val lines = item.changes.iterator.flatMap(_.change match {
            case Content.Insert(_, ls) => ls
            case _                     => Vector.empty[String]
          }).toVector
          state.updated(task, lines)
        case Some(existing) =>
          val isWholeRemove = item.changes.forall(_.change match {
            case Content.Remove(DiffRange(0, size), _) => size == existing.length
            case _                                     => false
          }) && item.changes.nonEmpty && item.changes.forall(_.change.isInstanceOf[Content.Remove])
          if (isWholeRemove) state.removed(task)
          else state.updated(task, applyChanges(existing, item.changes))
      }
    }
  }
}
