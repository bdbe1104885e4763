package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming exact deduplication over the event feed — the ingest-time
  * counterpart of the batch content-hash dedup (q18): the first event
  * carrying a given payload hash passes, replays and copies arriving
  * within the watermark window are dropped, and — the part that matters
  * at 100 TB — dedup STATE IS BOUNDED: `dropDuplicatesWithinWatermark`
  * retires a key's state once the watermark passes it, where plain
  * streaming `dropDuplicates` accumulates every key ever seen for the
  * lifetime of the query.
  *
  * Two trades, both explicit: (1) a duplicate arriving LATER than the
  * watermark window after its original is treated as new. For CDC replay
  * storms and at-least-once upstream delivery (the duplicate classes a
  * checkpoint feed actually produces — retries land within seconds, not
  * days) the window is easily sized; global forever-dedup belongs to the
  * batch path (q18 / q36) over the accumulated table. (2) The canonical
  * survivor is the first row to ARRIVE, which equals the earliest-event-
  * time row (the `batchDedup` reference) only under the CDC feed's
  * arrival-order contract (files land in event-time order — the same
  * contract the session stream relies on); under out-of-order delivery
  * within the window the kept CONTENT is identical but the surviving
  * row's (event_id, ts) may be a later duplicate's.
  */
object StreamDedup {

  /** Content identity of an event row: the 256-bit hash of its payload.
    * Hashing (not the raw payload) keys the state store — narrow, fixed
    * width, and collision-safe at any corpus size that fits in 2^128.
    */
  def contentKey(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sha2(payload, 256)

  /** The batch reference semantics for the parity test: first event (by
    * event time, id tie-break) per payload hash. Equals the streaming
    * survivor under the feed's arrival-order contract (scaladoc trade #2).
    * `ts` goes through the shared `Tables.tsMicros` dispatch exactly like
    * the streaming side, so the reference holds for every feed variant
    * (µs timestamp, ns-long, NTZ).
    */
  def batchDedup(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("content_hash"))
      .orderBy(col("ts"), col("event_id"))
    events
      .withColumn("ts", timestamp_micros(graft.Tables.tsMicros(events)))
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
      availableNow: Boolean = true,
      schemaHint: Option[org.apache.spark.sql.types.StructType] = None): StreamingQuery = {
    val raw = FeedStream.readAgentsFeed(spark, sourceDir, maxFilesPerTrigger,
      schemaHint, Seq("ts", "event_id", "props"), "StreamDedup")
    val events = raw
      .select(timestamp_micros(graft.Tables.tsMicros(raw)).as("ts"),
        col("event_id"), col("props"))
      .withColumn("content_hash", contentKey(col("props")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("content_hash")
      .select(col("content_hash"), col("event_id"), col("ts"), col("props"))
    FeedStream.startParquetSink(events, checkpointDir, sinkDir, availableNow)
  }
}
