package graft.streaming

import graft.diff.DiffModel.CheckpointData
import graft.state.SessionMerge
import graft.state.SessionMerge.SessionState
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import java.nio.charset.StandardCharsets

/** The streaming lifecycle (SURVEY §2.1 S1/S2/S4/S7, §3 E1/E2): a polling
  * micro-batch CDC feed over the event table, the keyed stateful merge as a
  * `flatMapGroupsWithState`, and an idempotent keyed upsert sink via
  * `foreachBatch`.
  *
  * Backfill-then-stream (reference `CdcSubscriberConfig.java:117-175`) is
  * realized by Structured Streaming's batch/stream unification: files that
  * exist when the query starts form the first micro-batch(es) — the same
  * state function processes backlog and live data, so E2 ≡ E1 by
  * construction rather than by a separate code path.
  */
object CheckpointStream {

  /** Input row shape (same derivation as SessionOps.q16SessionMerge). */
  final case class EventRow(
      user_id: Long, task_id: String, event_id: Long, ts_us: Long, props: String)

  /** Flattened session state emitted each time a session changes: the full
    * current content of the session plus its sequence number.
    */
  final case class SessionFlat(
      user_id: Long, task_id: String, event_id: Long, ts_us: Long,
      payload: String, seq: Int)

  /** Feed schema; `ts` is TimestampType for micro-precision files or
    * LongType for raw nanosecond-INT64 files (the driver testdata's
    * physical type under `nanosAsLong`) — see `feedSchemaFor`.
    */
  def eventsSchema(tsType: org.apache.spark.sql.types.DataType = TimestampType): StructType =
    StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", tsType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))

  /** Detect the feed's timestamp physical type from the files already
    * present (cheap footer-only batch read); a stream's explicit schema
    * must match the parquet physical type or every read fails. Defaults to
    * TimestampType when the directory is still empty.
    */
  def feedSchemaFor(spark: SparkSession, sourceDir: String): StructType = {
    val tsType =
      try spark.read.parquet(sourceDir).schema("ts").dataType
      catch { case _: Throwable => TimestampType }
    eventsSchema(tsType)
  }

  private def toCheckpoint(e: EventRow): CheckpointData =
    CheckpointData(
      checkpoint = e.props.getBytes(StandardCharsets.UTF_8),
      checkpointNs = e.ts_us,
      threadId = e.user_id.toString,
      checkpointId = f"${e.event_id}%020d",
      taskId = e.task_id)

  private def flatten(userId: Long, st: SessionState): Iterator[SessionFlat] =
    st.content.iterator.flatMap { case (task, cds) =>
      cds.iterator.map { cd =>
        SessionFlat(userId, task, cd.checkpointId.toLong, cd.checkpointNs,
          new String(cd.checkpoint, StandardCharsets.UTF_8), st.sequenceNumber)
      }
    }

  /** The per-key state function (C1 single-writer-per-key is guaranteed by
    * construction: one invocation per key per micro-batch). Folds the
    * batch's events in event-time order through `SessionMerge.update` — the
    * identical per-event cadence as the batch backfill — and emits the
    * session's full post-merge state.
    */
  def sessionStateFunc(
      userId: Long,
      events: Iterator[EventRow],
      state: GroupState[SessionState]): Iterator[SessionFlat] = {
    val st0 = state.getOption.getOrElse(SessionState.empty(userId.toString))
    val ordered = events.toVector.sortBy(e => (e.ts_us, e.event_id))
    val st1 = ordered.foldLeft(st0) { (st, ev) =>
      SessionMerge.update(st, Seq(toCheckpoint(ev)))._1
    }
    state.update(st1)
    if (ordered.isEmpty) Iterator.empty else flatten(userId, st1)
  }

  /** Normalize a raw events DataFrame (batch or streaming) to EventRow.
    * Handles both timestamp feeds and raw nanosecond-long feeds.
    */
  def toEventRows(df: DataFrame): Dataset[EventRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    val tsUs =
      if (df.schema("ts").dataType == LongType) expr("ts div 1000")
      else unix_micros(col("ts"))
    df.select(
      col("user_id"),
      when(col("event_type") === "signup", lit("__start__"))
        .otherwise(col("event_type")).as("task_id"),
      col("event_id"),
      tsUs.as("ts_us"),
      col("props"))
      .as[EventRow]
  }

  /** S7 upsert sink: replace the sink's rows for every session present in
    * the micro-batch with the batch's rows (find-or-create by sessionId,
    * reference `CdcAgentsDataStreamRepository.java:16-29`). Idempotent —
    * replaying a micro-batch rewrites the same rows — which with the
    * streaming checkpoint gives effectively-once. Parquet read-union-swap is
    * the dependency-free stand-in for a Delta/JDBC MERGE; single-writer per
    * query is guaranteed by foreachBatch serialization.
    */
  def upsert(batch: DataFrame, sinkDir: String): Unit = {
    val spark = batch.sparkSession
    val sink = new java.io.File(sinkDir)
    val existing: Option[DataFrame] =
      if (sink.exists && sink.listFiles != null && sink.listFiles.exists(_.getName.endsWith(".parquet")))
        Some(spark.read.parquet(sinkDir))
      else None
    val merged = existing match {
      case Some(ex) =>
        ex.join(batch.select("user_id").distinct(), Seq("user_id"), "left_anti")
          .unionByName(batch)
      case None => batch
    }
    val tmp = sinkDir + ".tmp"
    merged.write.mode("overwrite").parquet(tmp)
    // atomic-enough swap for a local sink: remove old, rename tmp
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
      f.delete(); ()
    }
    rm(sink)
    if (!new java.io.File(tmp).renameTo(sink))
      throw new java.io.IOException(s"sink swap failed: $tmp -> $sinkDir")
  }

  /** E1: the live pipeline. File-source micro-batches over `sourceDir`
    * (pre-existing files = startup backfill), keyed stateful merge, upsert
    * sink. `maxFilesPerTrigger` bounds per-batch work; AvailableNow drains
    * the backlog then stops (tests / bounded runs), ProcessingTime runs
    * forever.
    */
  def run(
      spark: SparkSession,
      sourceDir: String,
      checkpointDir: String,
      sinkDir: String,
      maxFilesPerTrigger: Int = 1,
      availableNow: Boolean = true): StreamingQuery = {
    import spark.implicits._
    val raw = spark.readStream
      .schema(feedSchemaFor(spark, sourceDir))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
    val states = toEventRows(raw)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(sessionStateFunc)
    val writer = states.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[SessionFlat], _: Long) =>
        upsert(batch.toDF(), sinkDir)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow())
     else writer.trigger(Trigger.ProcessingTime("1 second"))).start()
  }

  /** E2 as a standalone batch job (same engine path as `run`, no streaming
    * machinery): replay every session's full history and return the
    * flattened final states.
    */
  def backfill(spark: SparkSession, events: DataFrame): Dataset[SessionFlat] = {
    import spark.implicits._
    toEventRows(events)
      .groupByKey(_.user_id)
      .flatMapGroups { (userId: Long, it: Iterator[EventRow]) =>
        val (st, _) = SessionMerge.replay(userId.toString, it.map(toCheckpoint).toSeq)
        flatten(userId, st)
      }
  }
}
