package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Stream-stream interval join over the event feed: each purchase joined
  * to the same user's clicks from the preceding attribution window — the
  * classic streaming attribution shape, and the capability class the
  * rest of the streaming layer (stateful merge, windows, sessions,
  * dedup) doesn't cover.
  *
  * Scale shape: both sides shuffle on `user_id`; the WATERMARK plus the
  * time-range join condition lets Spark retire buffered rows once they
  * can no longer match (a click older than `window` behind the clicks
  * watermark is unreachable by any future purchase), so join state is
  * bounded by the attribution window × arrival rate — without the range
  * condition the buffers would grow forever.
  *
  * Inner join in append mode: a match is emitted as soon as both sides
  * have arrived; results for rows still inside the watermark horizon at
  * shutdown simply have not been emitted yet (the same bounded-drain
  * boundary the windowed specs assert).
  */
object StreamJoin {

  /** The join condition + projection shared by the stream and the batch
    * reference: purchases attributed to clicks at most `windowSec`
    * seconds earlier (inclusive bounds; same-instant clicks count).
    */
  def attribJoin(clicks: DataFrame, purchases: DataFrame, windowSec: Long): DataFrame =
    purchases.join(clicks,
      purchases("user_id") === clicks("user_id") &&
        clicks("c_ts") <= purchases("p_ts") &&
        clicks("c_ts") >= purchases("p_ts") - expr(s"INTERVAL $windowSec SECONDS"))
      .select(purchases("user_id"), col("p_event_id"), col("p_ts"),
        col("c_event_id"), col("c_ts"))

  private def sides(raw: DataFrame): (DataFrame, DataFrame) = {
    val ev = raw.select(
      timestamp_micros(graft.Tables.tsMicros(raw)).as("ts"),
      col("event_id"), col("user_id"), col("event_type"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("c_event_id"), col("ts").as("c_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_event_id"), col("ts").as("p_ts"))
    (clicks, purchases)
  }

  /** Batch reference for the parity test (same condition, static input). */
  def batchAttribution(events: DataFrame, windowSec: Long): DataFrame = {
    val (clicks, purchases) = sides(events)
    attribJoin(clicks, purchases, windowSec)
  }

  /** Run the streaming attribution join: one feed, two filtered streaming
    * sides, watermarks on both, interval-joined into an append parquet
    * sink.
    */
  def run(
      spark: SparkSession,
      sourceDir: String,
      checkpointDir: String,
      sinkDir: String,
      windowSec: Long = 3600,
      watermark: String = "30 minutes",
      maxFilesPerTrigger: Int = 1,
      availableNow: Boolean = true,
      schemaHint: Option[org.apache.spark.sql.types.StructType] = None): StreamingQuery = {
    val raw = FeedStream.readAgentsFeed(spark, sourceDir, maxFilesPerTrigger,
      schemaHint, Seq("ts", "event_id", "user_id", "event_type"), "StreamJoin")
    val (clicks0, purchases0) = sides(raw)
    val clicks = clicks0.withWatermark("c_ts", watermark)
    val purchases = purchases0.withWatermark("p_ts", watermark)
    FeedStream.startParquetSink(
      attribJoin(clicks, purchases, windowSec), checkpointDir, sinkDir, availableNow)
  }
}
