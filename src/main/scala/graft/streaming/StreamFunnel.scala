package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Continuous ordered-funnel tracking: q95's signup → click → purchase
  * stages maintained per user as events ARRIVE, with O(1) state per user
  * (three optional timestamps — `mapGroupsWithState`, not a replay of
  * the history).
  *
  * ONLINE SEMANTICS, stated precisely (the StreamCurate discipline):
  * events are processed in event-time order WITHIN each user's
  * micro-batch slice, and state advances greedily — a stage completes at
  * the first qualifying event and never retracts. When arrival order
  * respects event-time order (the in-order feed), the drained result
  * equals batch q95 exactly (`StreamFunnelSpec` pins this). A LATE
  * signup that predates an already-recorded one is the online trade: the
  * recorded funnel keeps the first-ARRIVED minimum, exactly as the
  * near-dup guard keeps the earliest-arrived duplicate. The batch
  * operator remains the point-in-time truth; the stream is the standing
  * approximation that never re-reads history.
  *
  * Each micro-batch appends its UPDATED users' funnel rows to
  * `outDir/batch_id=N` (first-write-wins replay contract);
  * [[readFunnel]] resolves each user's newest row.
  */
object StreamFunnel {

  private[graft] case class FunnelEvent(
      user_id: Long, event_type: String, t: Long, event_id: Long)

  private[graft] case class FunnelState(
      t_signup: Option[Long], t_click: Option[Long], t_purchase: Option[Long])

  private[graft] case class FunnelRow(
      user_id: Long, t_signup: Option[Long], t_click: Option[Long],
      t_purchase: Option[Long], stage: Int)

  private[graft] def advance(
      st: FunnelState, events: Seq[FunnelEvent]): FunnelState = {
    var s = st
    for (e <- events.sortBy(ev => (ev.t, ev.event_id))) e.event_type match {
      case "signup" if s.t_signup.isEmpty =>
        s = s.copy(t_signup = Some(e.t))
      case "click" if s.t_signup.exists(e.t > _) && s.t_click.isEmpty =>
        s = s.copy(t_click = Some(e.t))
      case "purchase" if s.t_click.exists(e.t > _) && s.t_purchase.isEmpty =>
        s = s.copy(t_purchase = Some(e.t))
      case _ => ()
    }
    s
  }

  private def toRow(userId: Long, s: FunnelState): FunnelRow =
    FunnelRow(userId, s.t_signup, s.t_click, s.t_purchase,
      1 + s.t_click.size + s.t_purchase.size)

  /** The streaming aggregation: one funnel row per user per trigger in
    * which that user's state advanced (or first appeared with a signup).
    */
  private[graft] def funnelUpdates(events: Dataset[FunnelEvent]): Dataset[FunnelRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout()) {
        (userId: Long, it: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          val prev = state.getOption.getOrElse(FunnelState(None, None, None))
          val next = advance(prev, it.toSeq)
          state.update(next)
          // emit only users whose funnel EXISTS (entered via signup);
          // pre-signup clicks create no row, matching batch q95's frame
          if (next.t_signup.isDefined) Iterator.single(toRow(userId, next))
          else Iterator.empty
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
      .as[FunnelEvent]
    val writer = funnelUpdates(events).toDF().writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) CheckpointStream.appendDiffs(batch, outDir, batchId)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  /** The CURRENT funnel: each user's newest committed row. */
  def readFunnel(spark: SparkSession, outDir: String): DataFrame = {
    val root = new Path(outDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(root), s"no funnel output under $outDir")
    val all = spark.read.parquet(outDir) // batch_id partition column
    val latest = all.groupBy(col("user_id"))
      .agg(max(col("batch_id")).as("batch_id"))
    all.join(latest, Seq("user_id", "batch_id"))
      .select(col("user_id"), col("t_signup"), col("t_click"),
        col("t_purchase"), col("stage"))
  }
}
