package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset-card reporting — the rollup every curated corpus ships
  * with: per-language document/token/char counts plus the grand
  * total, in ONE pass. Composes the engine's own pieces: the q170
  * constructed corpus and its planted labels, token counting, and a
  * ROLLUP aggregation (the q55 grouping-sets machinery — one Expand,
  * one exchange, never a self-union).
  *
  * Scale shape (100 TB): one group-by sized |langs|+1; the rollup adds
  * a constant factor to the map side, not a second scan.
  */
object ReportOps {

  /** q178: the corpus report — per-language and TOTAL rows from one
    * ROLLUP pass: the q170 label arithmetic partitions the corpus,
    * token/char stats come from the raw documents; counts, sums, and
    * the integer mean tokens/doc all replayed by the oracle
    * (grand-total row labeled `total`, languages alphabetical).
    */
  def q178CorpusReport(spark: SparkSession, dir: String): DataFrame = {
    val langs = LangIdOps.LangNames
    val langOf = element_at(
      array(langs.map(lit): _*), (col("doc_id") % 6 + 1).cast("int"))
    Tables.documents(spark, dir)
      .select(langOf.as("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("n_chars"))
      .rollup(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        sum(col("n_chars")).as("sum_chars"))
      .select(coalesce(col("lang"), lit("total")).as("lang"),
        col("n_docs"), col("sum_tokens"), col("sum_chars"),
        (col("sum_tokens") / col("n_docs")).cast("long").as("tokens_per_doc"))
      .orderBy(col("lang"))
  }
}
