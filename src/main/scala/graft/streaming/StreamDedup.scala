package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming exact deduplication over the event feed — the ingest-time
  * counterpart of the batch content-hash dedup (q18): the first event
  * carrying a given payload hash passes, replays and copies arriving
  * within the watermark window are dropped, and — the part that matters
  * at 100 TB — dedup STATE IS BOUNDED: `dropDuplicatesWithinWatermark`
  * retires a key's state once the watermark passes it, where plain
  * streaming `dropDuplicates` accumulates every key ever seen for the
  * lifetime of the query.
  *
  * The trade is explicit and documented: a duplicate arriving LATER than
  * the watermark window after its original is treated as new. For CDC
  * replay storms and at-least-once upstream delivery (the duplicate
  * classes a checkpoint feed actually produces — retries land within
  * seconds, not days) the window is easily sized; global forever-dedup
  * belongs to the batch path (q18 / q36) over the accumulated table.
  */
object StreamDedup {

  /** Content identity of an event row: the 256-bit hash of its payload.
    * Hashing (not the raw payload) keys the state store — narrow, fixed
    * width, and collision-safe at any corpus size that fits in 2^128.
    */
  def contentKey(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sha2(payload, 256)

  /** The batch reference semantics for the parity test: first event (by
    * event time, id tie-break) per payload hash.
    */
  def batchDedup(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("content_hash"))
      .orderBy(col("ts"), col("event_id"))
    events
      .withColumn("content_hash", contentKey(col("props")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("content_hash"), col("event_id"), col("ts"), col("props"))
  }

  /** Run the watermark-bounded streaming dedup: agents feed → first
    * occurrence per payload hash → append-only parquet sink.
    */
  def run(
      spark: SparkSession,
      sourceDir: String,
      checkpointDir: String,
      sinkDir: String,
      watermark: String = "1 hour",
      maxFilesPerTrigger: Int = 1,
      availableNow: Boolean = true): StreamingQuery = {
    val schema = CheckpointStream.feedSchemaFor(spark, sourceDir)
    require(schema.fieldNames.contains("props"),
      s"StreamDedup requires the agents feed shape (ts/event_id/props); " +
        s"detected columns: ${schema.fieldNames.mkString(", ")}")
    val raw = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
    val events = raw
      .select(timestamp_micros(graft.Tables.tsMicros(raw)).as("ts"),
        col("event_id"), col("props"))
      .withColumn("content_hash", contentKey(col("props")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("content_hash")
      .select(col("content_hash"), col("event_id"), col("ts"), col("props"))
    val writer = events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .format("parquet")
      .option("path", sinkDir)
    (if (availableNow) writer.trigger(Trigger.AvailableNow())
     else writer.trigger(Trigger.ProcessingTime("1 second"))).start()
  }
}
