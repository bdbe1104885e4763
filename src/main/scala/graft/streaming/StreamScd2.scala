package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Continuous type-2 dimension maintenance: q100's SCD2 build kept up to
  * date as events arrive. Per user the state is ONE open version (state
  * string, valid_from, version counter) — never the history; each
  * micro-batch processes the user's slice in event-time order and:
  *
  *   - CLOSES the open version when the state changes (the closed row is
  *     immutable and appended exactly once — dimension history is
  *     append-only by construction);
  *   - re-emits the (possibly new) OPEN version row (valid_to null), so
  *     the newest generation always carries each touched user's current
  *     state.
  *
  * [[readDimension]] reassembles the full SCD2 table: all closed rows
  * plus each user's newest open row. For an in-order feed the
  * reconstruction equals batch q100 EXACTLY (spec-pinned); the online
  * trade for late data is the funnel's: a late event that predates the
  * open version's start keeps the recorded history (no retraction — a
  * batch rebuild remains the point-in-time truth).
  */
object StreamScd2 {

  private[graft] case class Scd2Event(
      user_id: Long, event_type: String, t: Long, event_id: Long)

  private[graft] case class OpenVersion(version: Long, state: String, valid_from: Long)

  private[graft] case class Scd2Row(
      user_id: Long, version: Long, state: String,
      valid_from: Long, valid_to: Option[Long], open: Boolean)

  /** Batch step: close/open versions over the slice in event-time order.
    * Returns (new state, closed rows to append). */
  private[graft] def advance(
      st: Option[OpenVersion], events: Seq[Scd2Event])
    : (Option[OpenVersion], Seq[(OpenVersion, Long)]) = {
    var cur = st
    val closed = scala.collection.mutable.ArrayBuffer.empty[(OpenVersion, Long)]
    for (e <- events.sortBy(ev => (ev.t, ev.event_id))) cur match {
      case None =>
        cur = Some(OpenVersion(1L, e.event_type, e.t))
      case Some(v) if v.state != e.event_type =>
        closed += ((v, e.t))
        cur = Some(OpenVersion(v.version + 1L, e.event_type, e.t))
      case _ => () // same state: the run continues
    }
    (cur, closed.toSeq)
  }

  private[graft] def updates(events: Dataset[Scd2Event]): Dataset[Scd2Row] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout()) {
        (userId: Long, it: Iterator[Scd2Event], state: GroupState[OpenVersion]) =>
          val (next, closed) = advance(state.getOption, it.toSeq)
          next.foreach(state.update)
          val closedRows = closed.map { case (v, to) =>
            Scd2Row(userId, v.version, v.state, v.valid_from, Some(to), open = false)
          }
          val openRow = next.map(v =>
            Scd2Row(userId, v.version, v.state, v.valid_from, None, open = true))
          (closedRows ++ openRow).iterator
      }
  }

  def run(
      spark: SparkSession,
      sourceDir: String,
      checkpointDir: String,
      outDir: String,
      maxFilesPerTrigger: Int = 1,
      availableNow: Boolean = true,
      schemaHint: Option[StructType] = None): StreamingQuery = {
    import spark.implicits._
    val raw = spark.readStream
      .schema(schemaHint.getOrElse(spark.read.parquet(sourceDir).schema))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
    val events = raw.select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("t"), col("event_id"))
      .as[Scd2Event]
    val writer = updates(events).toDF().writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) CheckpointStream.appendDiffs(batch, outDir, batchId)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  /** The full dimension: every closed version (immutable, appended once)
    * plus each user's NEWEST open version row. */
  def readDimension(spark: SparkSession, outDir: String): DataFrame = {
    val root = new Path(outDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(root), s"no dimension output under $outDir")
    val all = spark.read.parquet(outDir)
    val closed = all.where(!col("open"))
    val openLatest = all.where(col("open"))
      .join(all.where(col("open"))
          .groupBy(col("user_id")).agg(max(col("batch_id")).as("batch_id")),
        Seq("user_id", "batch_id"))
    closed.unionByName(openLatest)
      .select(col("user_id"), col("version"), col("state"),
        col("valid_from"), col("valid_to"))
  }
}
