package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tabular text ingestion — CSV is the other big structured-text
  * format a crawl/data pipeline mines, and RFC 4180 quoting is its
  * classic correctness trap: a field containing commas, quotes, or
  * NEWLINES is wrapped in quotes with embedded quotes DOUBLED, so a
  * naive `split(',')` reader shears rows and a backslash-escape
  * reader (Spark's default!) mis-reads doubled quotes.
  *
  * Spark-first: BOTH sides stay native codegen — the writer builds the
  * RFC 4180 line with string expressions (quote-doubling via
  * `replace`), the reader is the built-in `from_csv` with
  * `escape='"'` (the RFC's doubling convention; the default `\`
  * escape would corrupt exactly the planted cells). No Scala-side
  * parsing anywhere; the plan is one projection.
  */
object TabularOps {

  /** q175: the CSV round trip — per document a 3-column record whose
    * middle cell carries the full hostile class (embedded comma,
    * doubled quotes, a real newline), encoded by the expression-side
    * writer and decoded by `from_csv`; the oracle replays the cell
    * straight from (doc_id, text) — the encode→decode collapse: any
    * quoting/escape/newline slip changes the sha or shears `c`.
    */
  def q175CsvRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id").cast("string")
    // the hostile middle cell: corpus text + a planted block with a
    // comma, a doubled-quote candidate, and an embedded newline
    val cell = concat(col("text"),
      lit("\n\"q\" one,two of "), id)
    val quoted = concat(lit("\""),
      regexp_replace(cell, "\"", "\"\""), lit("\""))
    val line = concat(lit("Doc "), id, lit(","), quoted, lit(","), id)
    val parsed = from_csv(line,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("b",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("c",
          org.apache.spark.sql.types.LongType))),
      Map("escape" -> "\"")) // RFC 4180 doubling, not backslash
    Tables.documents(spark, dir)
      .select(col("doc_id"), parsed.as("r"))
      .select(col("doc_id"),
        col("r.a").as("a"),
        sha2(col("r.b"), 256).as("b_sha"),
        length(col("r.b")).cast("long").as("b_len"),
        col("r.c").as("c"))
      .orderBy(col("doc_id"))
  }
}
