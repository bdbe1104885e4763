package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unicode-script detection — the writing-system complement of q19's
  * marker-word language ID: marker words only work ABOVE the language
  * level (and only for languages with markers), while a multilingual
  * crawl's first routing decision is cheaper and more robust — which
  * SCRIPT dominates the codepoints (Han → the CJK pipeline, Cyrillic /
  * Arabic / Latin → theirs). fastText-class routers do exactly this
  * before any model runs.
  *
  * The detector is the real thing: per-script codepoint counts via
  * Java's Unicode script classes (`\p{IsHan}`, `\p{IsCyrillic}`,
  * `\p{IsArabic}`, `\p{IsLatin}`) in one codegen regexp chain — no
  * UDFs, no shuffle. Dominance is argmax with a fixed alphabetical
  * tie-break, plus an integer Latin-share percentage (the mixed-text
  * gate a curation pipeline thresholds on).
  *
  * The ASCII base corpus can't exercise this, so the q157 corpus
  * plants per-document script runs by doc_id arithmetic (periods 5,
  * 20, 10 — scaled so Han genuinely outweighs Latin on a quarter of
  * the corpus and dominance flips) and the oracle replays every count
  * — the Latin count from its own ASCII-letter regexp over the raw
  * text, the planted counts from arithmetic — and re-derives the
  * argmax independently.
  *
  * Scale shape (100 TB): one codegen projection per row, zero
  * exchange.
  */
object ScriptOps {

  /** Per-document planted runs: 漢 (Han), д (Cyrillic), ش (Arabic). */
  private[graft] def syntheticScriptText(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), concat(
      col("text"),
      expr("repeat('漢', cast((doc_id % 5) * 120 as int))"),
      expr("repeat('д', cast(doc_id % 20 as int))"),
      expr("repeat('ش', cast(doc_id % 10 as int))")).as("composed"))

  /** Codepoints of one Unicode script class in a string column. */
  def scriptCount(s: Column, script: String): Column =
    length(regexp_replace(s, s"[^\\p{Is$script}]", "")).cast("long")

  /** q157: script detection end to end — real `\p{Is…}` counts over
    * the planted multi-script corpus, argmax dominance with the
    * alphabetical tie-break, integer Latin share; every column
    * replayed by the oracle (Latin via its own ASCII regexp, the rest
    * from arithmetic, the argmax re-derived).
    */
  def q157ScriptDetect(spark: SparkSession, dir: String): DataFrame = {
    val nLatin = scriptCount(col("composed"), "Latin")
    val nHan = scriptCount(col("composed"), "Han")
    val nCyr = scriptCount(col("composed"), "Cyrillic")
    val nArab = scriptCount(col("composed"), "Arabic")
    syntheticScriptText(Tables.documents(spark, dir))
      .select(col("doc_id"), nLatin.as("n_latin"), nHan.as("n_han"),
        nCyr.as("n_cyrillic"), nArab.as("n_arabic"))
      .withColumn("dominant",
        // argmax, ties alphabetical: arabic < cyrillic < han < latin
        when(col("n_arabic") >= col("n_cyrillic") &&
          col("n_arabic") >= col("n_han") &&
          col("n_arabic") >= col("n_latin"), lit("arabic"))
          .when(col("n_cyrillic") >= col("n_han") &&
            col("n_cyrillic") >= col("n_latin"), lit("cyrillic"))
          .when(col("n_han") >= col("n_latin"), lit("han"))
          .otherwise(lit("latin")))
      .withColumn("latin_pct",
        col("n_latin") * 100 / greatest(
          col("n_latin") + col("n_han") + col("n_cyrillic") + col("n_arabic"),
          lit(1L)))
      .select(col("doc_id"), col("n_latin"), col("n_han"), col("n_cyrillic"),
        col("n_arabic"), col("dominant"),
        col("latin_pct").cast("long").as("latin_pct"))
      .orderBy(col("doc_id"))
  }
}
