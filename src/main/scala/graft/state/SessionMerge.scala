package graft.state

import graft.diff.DiffEngine
import graft.diff.DiffModel.{CheckpointData, CheckpointDataDiff}

/** The engine core (SURVEY.md §2.3 D1–D3, D11, D13): keyed stateful merge of
  * checkpoint events into an accumulating per-session task map, with
  * late-data skip, `__start__` append/dedup semantics, a real monotonic
  * sequence number (fixing reference wart W2), and diff emission against the
  * pre-merge state.
  *
  * Pure function of `(SessionState, events) => (SessionState, diffs)` so the
  * batch backfill (E2) and the streaming path (E1,
  * `flatMapGroupsWithState`) share one implementation — reference behavior
  * from `service/DataStreamService.java:61-93,125-174` and
  * `dao/CheckpointDao.java:33-56`.
  */
object SessionMerge {

  /** Accumulated per-session state: task → retained checkpoints.
    * `sequenceNumber` advances once per update that produced a diff.
    */
  final case class SessionState(
      sessionId: String,
      sequenceNumber: Int,
      content: Map[String, Vector[CheckpointData]]) {
    def isEmpty: Boolean = content.isEmpty
  }

  object SessionState {
    def empty(sessionId: String): SessionState = SessionState(sessionId, 0, Map.empty)
  }

  /** D3 late-data guard (reference `CheckpointDao.skipParsingCheckpoint`
    * :33-56): skip an incoming event iff the stored max-ns checkpoint for
    * the task is non-blank and strictly newer.
    */
  def skipStale(existing: Vector[CheckpointData], incomingNs: Long): Boolean =
    existing.nonEmpty && {
      val latest = existing.maxBy(_.checkpointNs)
      val blank = latest.checkpoint == null || latest.checkpoint.isEmpty
      !blank && latest.checkpointNs > incomingNs
    }

  /** D2 keyed merge (reference `DataStreamService.mergeAdd` :72-93):
    * key absent → insert; key contains `__start__` → append unless an
    * element with an equal event-time already exists (dedup-by-timestamp);
    * otherwise → replace (keep only the incoming checkpoint).
    */
  def mergeOne(
      content: Map[String, Vector[CheckpointData]],
      cd: CheckpointData): Map[String, Vector[CheckpointData]] =
    content.get(cd.taskId) match {
      case None => content.updated(cd.taskId, Vector(cd))
      case Some(existing) if cd.taskId.contains("__start__") =>
        if (existing.exists(_.checkpointNs == cd.checkpointNs)) content
        else content.updated(cd.taskId, existing :+ cd)
      case Some(_) => content.updated(cd.taskId, Vector(cd))
    }

  /** D1 group-by + argmax (reference `DataStreamService.java:134-140`): one
    * incoming checkpoint per task — the max by event-time, with checkpointId
    * as the deterministic tie-break.
    */
  def latestPerTask(events: Seq[CheckpointData]): Map[String, CheckpointData] =
    events.groupBy(_.taskId).map { case (task, cds) =>
      task -> cds.maxBy(cd => (cd.checkpointNs, cd.checkpointId))
    }

  /** Content evolution of one engine step: argmax incoming events per task,
    * drop stale ones, merge the rest. Shared by the diff-emitting `update`
    * and the diff-free `mergeOnly` — the content result is identical by
    * construction (`update` stores the merged content whether or not the
    * diff turned out empty).
    */
  def mergeContent(
      content: Map[String, Vector[CheckpointData]],
      events: Seq[CheckpointData]): Map[String, Vector[CheckpointData]] =
    latestPerTask(events).values.foldLeft(content) { (acc, cd) =>
      if (skipStale(acc.getOrElse(cd.taskId, Vector.empty), cd.checkpointNs)) acc
      else mergeOne(acc, cd)
    }

  /** One engine step: merge, diff the result against the pre-merge state,
    * and advance the sequence number iff a diff was produced (D11, fixing W2).
    */
  def update(
      state: SessionState,
      events: Seq[CheckpointData]): (SessionState, Option[CheckpointDataDiff]) = {
    val merged = mergeContent(state.content, events)
    DiffEngine.computeDiff(state.content, merged, state.sequenceNumber + 1) match {
      case some @ Some(_) =>
        (state.copy(sequenceNumber = state.sequenceNumber + 1, content = merged), some)
      case None =>
        (state.copy(content = merged), None)
    }
  }

  /** Merge-only step for callers that need final content but not diffs or
    * sequence numbers (the q16 batch replay): skips JSON canonicalization +
    * Myers entirely — the dominant per-event cost when diffs are discarded.
    * `sequenceNumber` is NOT maintained (stays as passed in).
    */
  def mergeOnly(state: SessionState, events: Seq[CheckpointData]): SessionState =
    state.copy(content = mergeContent(state.content, events))

  /** Fold a whole event history (in event-time order) through the engine —
    * the batch-backfill form (E2). Returns the final state and every diff
    * emitted along the way.
    */
  def replay(
      sessionId: String,
      events: Seq[CheckpointData]): (SessionState, Vector[CheckpointDataDiff]) = {
    val ordered = events.sortBy(cd => (cd.checkpointNs, cd.checkpointId))
    ordered.foldLeft((SessionState.empty(sessionId), Vector.empty[CheckpointDataDiff])) {
      case ((state, diffs), ev) =>
        val (next, diff) = update(state, Seq(ev))
        (next, diffs ++ diff)
    }
  }
}
