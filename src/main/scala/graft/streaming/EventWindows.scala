package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Watermarked tumbling-window aggregation over the event feed — the
  * Structured-Streaming-native form of the relational time-bucket rollup
  * (q15): per (window, event_type) counts and value sums, with late data
  * beyond the watermark dropped and each window appended to the sink
  * exactly once when it finalizes.
  *
  * Scale shape: one shuffle on (window, event_type); state is bounded by
  * open windows × types (watermark advancement retires state); map-side
  * partial aggregation applies exactly as in the batch form.
  *
  * Append-mode semantics worth knowing: a window only reaches the sink
  * once the watermark passes its end, so when a bounded run drains
  * (AvailableNow), trailing windows within `watermark` of the max event
  * time remain open in state and are NOT emitted — the parity test
  * asserts exactly that boundary.
  */
object EventWindows {

  /** Normalize the agents feed's `ts` to TimestampType (ns-long and NTZ
    * variants included — one shared dispatch in `Tables.tsMicros`),
    * keeping the aggregation columns.
    */
  def normalizeTs(df: DataFrame): DataFrame =
    df.select(timestamp_micros(graft.Tables.tsMicros(df)).as("ts"),
      col("event_type"), col("value"))

  /** The batch-equivalent aggregation, for parity checks and reuse. The
    * sum accumulates in DECIMAL (exact, order-independent) and casts to
    * double at the end — double accumulation order varies per run/engine,
    * which would break cross-engine value comparison.
    */
  def windowedStats(events: DataFrame, windowDur: String): DataFrame =
    events
      .groupBy(window(col("ts"), windowDur).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** q29: the oracle-checked batch form — hourly event-time windows per
    * type, window bounds exposed as epoch micros (timestamps hash
    * differently across engines; micros do not).
    */
  def q29WindowedAgg(spark: SparkSession, dir: String): DataFrame =
    windowedStats(normalizeTs(graft.Tables.events(spark, dir)), "1 hour")
      .select(unix_micros(col("window_start")).as("ws_us"),
        unix_micros(col("window_end")).as("we_us"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy(col("ws_us"), col("event_type"))

  /** Sliding event-time windows: `window(ts, size, slide)` — each event
    * lands in size/slide overlapping windows (4 here), the moving-average
    * shape tumbling windows can't express. Same DECIMAL-exact sum and
    * epoch-micros bounds as q29; works unchanged under `readStream` +
    * watermark (the tumbling lane's streaming story carries over —
    * sliding windows are the same `TimeWindow` expression with a slide).
    */
  def slidingStats(events: DataFrame, windowDur: String, slideDur: String): DataFrame =
    events
      .groupBy(window(col("ts"), windowDur, slideDur).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** q106: the oracle-checked batch form of the sliding window — 1-hour
    * windows sliding by 15 minutes per event type. */
  def q106SlidingWindow(spark: SparkSession, dir: String): DataFrame =
    slidingStats(normalizeTs(graft.Tables.events(spark, dir)), "1 hour", "15 minutes")
      .select(unix_micros(col("window_start")).as("ws_us"),
        unix_micros(col("window_end")).as("we_us"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy(col("ws_us"), col("event_type"))

  /** Per-user session aggregation via Spark's native `session_window`
    * (the STREAMING counterpart of the batch gap-sessionization q33;
    * note the boundary convention differs at exactly-gap spacing:
    * `session_window` merges while the next event is STRICTLY inside
    * last+gap, q33's lag-split keeps gaps ≤ threshold — identical on any
    * corpus without exact-gap ties). Shared by the stream and the
    * batch-parity side: sessions are keyed per user, state per key is one
    * open session, retired as the watermark passes its end.
    */
  def sessionStats(events: DataFrame, gapDur: String): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gapDur).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

  /** `ts` + `user_id` normalization for the session stream. */
  def normalizeSess(df: DataFrame): DataFrame =
    df.select(timestamp_micros(graft.Tables.tsMicros(df)).as("ts"), col("user_id"))

  /** Run the watermarked per-user session stream: agents feed →
    * `session_window` sessions → append-only parquet sink of finalized
    * sessions (append mode emits a session exactly once, when the
    * watermark passes its end — merged-but-still-open sessions stay in
    * state, exactly like the tumbling form's trailing windows).
    */
  def runSessions(
      spark: SparkSession,
      sourceDir: String,
      checkpointDir: String,
      sinkDir: String,
      gapDur: String = "24 hours",
      watermark: String = "30 minutes",
      maxFilesPerTrigger: Int = 1,
      availableNow: Boolean = true,
      schemaHint: Option[org.apache.spark.sql.types.StructType] = None): StreamingQuery = {
    val raw = FeedStream.readAgentsFeed(spark, sourceDir, maxFilesPerTrigger,
      schemaHint, Seq("ts", "user_id"), "EventWindows.runSessions")
    val events = normalizeSess(raw).withWatermark("ts", watermark)
    FeedStream.startParquetSink(
      sessionStats(events, gapDur), checkpointDir, sinkDir, availableNow)
  }

  /** Run the watermarked stream: parquet agents feed → event-time tumbling
    * windows → append-only parquet sink of finalized windows.
    */
  def run(
      spark: SparkSession,
      sourceDir: String,
      checkpointDir: String,
      sinkDir: String,
      windowDur: String = "1 hour",
      watermark: String = "30 minutes",
      maxFilesPerTrigger: Int = 1,
      availableNow: Boolean = true,
      schemaHint: Option[org.apache.spark.sql.types.StructType] = None): StreamingQuery = {
    // the windowed rollup aggregates the agents feed's value column; the
    // IDE wire shape has none — fail loudly instead of at stream runtime
    val raw = FeedStream.readAgentsFeed(spark, sourceDir, maxFilesPerTrigger,
      schemaHint, Seq("ts", "event_type", "value"), "EventWindows.run")
    val events = normalizeTs(raw).withWatermark("ts", watermark)
    FeedStream.startParquetSink(
      windowedStats(events, windowDur), checkpointDir, sinkDir, availableNow)
  }
}
