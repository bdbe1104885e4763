package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Shared scaffolding for the parquet-feed streaming jobs (tumbling
  * windows, session windows, streaming dedup): feed-schema resolution
  * with an explicit-hint escape hatch, the micro-batch file source, and
  * the append-only parquet sink with bounded/live trigger selection.
  * One place to evolve the stream plumbing — each job reduces to its own
  * transform.
  */
private[streaming] object FeedStream {

  /** Open the agents feed as a micro-batch stream. `schemaHint` wins over
    * sniffing — sniffing reads the files present at start and cannot see
    * files that arrive after the query starts, so a dir that is empty at
    * start would default to the wrong timestamp physical type (the exact
    * trap `CheckpointStream.run`'s schemaHint exists for). `required`
    * names the columns the job aggregates; failing here beats failing at
    * stream runtime.
    */
  def readAgentsFeed(
      spark: SparkSession,
      sourceDir: String,
      maxFilesPerTrigger: Int,
      schemaHint: Option[StructType],
      required: Seq[String],
      jobName: String): DataFrame = {
    val schema = schemaHint.getOrElse(CheckpointStream.feedSchemaFor(spark, sourceDir))
    require(required.forall(schema.fieldNames.contains),
      s"$jobName requires the agents feed shape (${required.mkString("/")}); " +
        s"detected columns: ${schema.fieldNames.mkString(", ")}")
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
  }

  /** Append-only parquet sink: AvailableNow drains the backlog then
    * stops (tests / bounded runs), ProcessingTime runs forever.
    */
  def startParquetSink(
      df: DataFrame,
      checkpointDir: String,
      sinkDir: String,
      availableNow: Boolean): StreamingQuery = {
    val writer = df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .format("parquet")
      .option("path", sinkDir)
    (if (availableNow) writer.trigger(Trigger.AvailableNow())
     else writer.trigger(Trigger.ProcessingTime("1 second"))).start()
  }
}
