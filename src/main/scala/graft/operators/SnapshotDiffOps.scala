package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Crawl-snapshot diff — the engine's CDC identity (the full-outer key
  * diff of the reference's diff service, SURVEY §2.3 D5) applied to
  * the crawl domain: two crawl snapshots of one URL space, classified
  * into `same` / `changed` / `gone` / `new` by digest comparison. This
  * is how an incremental refresh decides what to re-extract: only
  * `changed`+`new` flow downstream, which at 100 TB is the difference
  * between re-processing a crawl and re-processing a delta.
  *
  * Snapshot arithmetic (period-disjoint so every class is populated at
  * every sf): snapshot A holds `/doc/<id>` for every document at
  * content version 0; snapshot B re-crawls everything except
  * `id % 7 == 3` (those are GONE), bumps content to version 1 where
  * `id % 5 == 0` (CHANGED), and discovers `/new/<id>` where
  * `id % 13 == 0` (NEW). Digests are sha256 over the versioned
  * content key — the oracle replays them and the classification.
  *
  * Scale shape (100 TB): ONE full-outer shuffle join on the URL key —
  * the minimum any snapshot diff needs (both sides corpus-sized;
  * sort-merge is the right physical join, AQE may downgrade at small
  * sf) — then a per-row classification projection; output is
  * union-sized.
  */
object SnapshotDiffOps {

  private def digest(version: org.apache.spark.sql.Column) =
    sha2(concat(lit("v"), version.cast("string"), lit(":"), col("url")), 256)

  /** q158: the snapshot diff end to end — build both snapshots from
    * doc_id arithmetic, full-outer join on url, classify by digest;
    * every row (including both digests) oracle-replayed.
    */
  def q158SnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    // narrow scan (r22): measured widen tax (see Tables widen-policy note)
    val docs = Tables.documentsNarrow(spark, dir).select(col("doc_id"))
    val a = docs.select(
      concat(lit("/doc/"), col("doc_id").cast("string")).as("url"))
      .withColumn("a_digest", digest(lit(0)))
    val bOld = docs.filter(col("doc_id") % 7 =!= 3)
      .select(col("doc_id"),
        concat(lit("/doc/"), col("doc_id").cast("string")).as("url"))
      .withColumn("b_digest",
        digest(when(col("doc_id") % 5 === 0, lit(1)).otherwise(lit(0))))
      .drop("doc_id")
    val bNew = docs.filter(col("doc_id") % 13 === 0)
      .select(concat(lit("/new/"), col("doc_id").cast("string")).as("url"))
      .withColumn("b_digest", digest(lit(1)))
    val b = bOld.unionByName(bNew)
    a.join(b, Seq("url"), "full_outer")
      .select(col("url"),
        when(col("a_digest").isNull, lit("new"))
          .when(col("b_digest").isNull, lit("gone"))
          .when(col("a_digest") === col("b_digest"), lit("same"))
          .otherwise(lit("changed")).as("status"),
        coalesce(col("a_digest"), lit("")).as("a_digest"),
        coalesce(col("b_digest"), lit("")).as("b_digest"))
      .orderBy(col("url"))
  }
}
