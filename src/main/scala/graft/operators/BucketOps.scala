package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketing for co-located joins: persist both sides bucketed and sorted
  * on the join key so repeated joins run shuffle-free (sort-merge over
  * pre-bucketed files). The write pays one shuffle ONCE; every subsequent
  * join on the bucket key reads co-located buckets — at 100 TB this is the
  * difference between a per-query multi-TB exchange and none.
  *
  * Bucket counts must match (or divide) across join sides; keep them a
  * power of two sized so one bucket's data fits an executor core.
  */
object BucketOps {

  /** Persist `df` as a bucketed, sorted table under `fqTableName`
    * (database-qualified; create the database with an explicit LOCATION to
    * control where files land).
    */
  def writeBucketed(
      df: DataFrame,
      fqTableName: String,
      keyCol: String,
      numBuckets: Int): Unit =
    df.write
      .bucketBy(numBuckets, keyCol)
      .sortBy(keyCol)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(fqTableName)

  /** Join two bucketed tables on their bucket key — planner elides both
    * exchanges when bucket specs line up.
    */
  def coLocatedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      keyCol: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keyCol)
}
