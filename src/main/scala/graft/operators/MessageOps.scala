package graft.operators

import graft.Tables
import graft.functions.Messages
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Message-parse query surface (D14): build tagged message JSON from the
  * event stream, run it through the polymorphic parser, extract normalized
  * fields. The oracle computes the same final values directly from the
  * event columns, so the whole build→parse→normalize→extract path is
  * value-checked.
  */
object MessageOps {

  /** Deterministic event-type → message-type tag mapping. */
  private def msgType: org.apache.spark.sql.Column =
    when(col("event_type") === "signup", "human")
      .when(col("event_type") === "purchase", "ai")
      .when(col("event_type") === "click", "tool")
      .when(col("event_type") === "view", "system")
      .otherwise("function")

  def q17MessageParse(spark: SparkSession, dir: String): DataFrame = {
    val even = col("event_id") % 2 === 0
    // even events carry array content, odd ones string content — both wire
    // shapes of the reference's ContentValue union flow through the parser
    val msgJson = when(even,
      to_json(struct(
        msgType.as("type"),
        array(col("props"), col("event_type")).as("content"),
        map(lit("et"), col("event_type")).as("additional_kwargs"),
        col("event_id").cast("string").as("name"))))
      .otherwise(to_json(struct(
        msgType.as("type"),
        col("props").as("content"),
        map(lit("et"), col("event_type")).as("additional_kwargs"),
        col("event_id").cast("string").as("name"))))
    Tables.events(spark, dir)
      .repartition(col("event_id")) // distribute the JSON build+parse work
      .withColumn("msg_json", msgJson)
      .withColumn("msg", Messages.parseMessage(col("msg_json")))
      .withColumn("content_arr", Messages.contentArray(col("msg.content")))
      .select(
        col("event_id"),
        col("msg.type").as("msg_type"),
        col("msg.name").as("msg_name"),
        element_at(col("msg.additional_kwargs"), "et").as("kwargs_et"),
        array_join(col("content_arr"), "|").as("content_joined"),
        size(col("content_arr")).as("n_content"))
      .orderBy(col("event_id"))
  }
}
