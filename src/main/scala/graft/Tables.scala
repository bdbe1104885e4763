package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Table loaders for the driver-provided parquet testdata
  * (`/root/testdata/sf*`, see TESTDATA.md). Every query function takes the
  * scale-factor directory so the same code runs at sf0.001/0.01/0.1.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Input-parallelism repair for UNSPLITTABLE narrow scans (the
    * optimization-guide §2.5 case: "one huge unsplittable file …
    * repartition immediately after the read"). The sf testdata ships
    * every table as a single-row-group parquet file, so every scan is
    * ONE task and — because the first heavy projection (tokenize,
    * regex extraction, record synthesis) runs inside the scan stage —
    * whole query pipelines were measured running single-threaded on a
    * 32-core host (r21 profile: q116's 4.0 s tokenize stage, tasks=1).
    *
    * Scale-adaptive by construction, not a local[32] constant: when the
    * scan already yields at least `defaultParallelism` partitions (any
    * real multi-file/multi-row-group corpus — the 100 TB case), this is
    * the IDENTITY and the plan (including scan-level filter pushdown)
    * is untouched. Only a scan narrower than the cluster is widened,
    * by a deterministic HASH repartition on the table's primary key —
    * never round-robin, so task retries can't reshuffle rows, and
    * downstream groupBy/join/window on the same key reuse the
    * partitioning instead of paying a second exchange.
    */
  private def widen(df: DataFrame, key: String): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    // Estimate the scan's split count WITHOUT `df.rdd` (which forces a
    // full physical plan + an extra RDD lineage per table load — r21
    // verdict item 6). Spark packs parquet files into splits of
    // `maxPartitionBytes`, so splits ≥ max(ceil(bytes/maxPartitionBytes),
    // — for many-small-files tables — fileCount-bounded packing). The
    // estimate errs toward FEWER splits only when openCostInBytes padding
    // would have split finer, i.e. toward widening — never toward
    // silently skipping the repair. At scale either term is ≥ the
    // cluster width and the widen is the identity, exactly as before.
    val est = df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        val maxPB = math.max(1L, spark.sessionState.conf.filesMaxPartitionBytes)
        val sizes = l.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.listFiles(Nil, Nil).flatMap(_.files.map(_.getLen))
          case _ => Seq(l.relation.sizeInBytes.toLong)
        }
        sizes.map(sz => math.max(1L, (sz + maxPB - 1) / maxPB)).sum
    }.getOrElse(Long.MaxValue) // unknown relation shape: leave as-read
    if (est < target) df.repartition(target, col(key)) else df
  }

  /** THE ts-shape dispatch, shared by every event-feed consumer (batch
    * loader, streaming normalizer, windowed aggregation) so a new feed
    * variant is handled in exactly one place. Returns the micros-since-
    * epoch expression for a `ts` column of any supported physical shape:
    *  - ns-long (spark.sql.legacy.parquet.nanosAsLong=true; Spark has no
    *    nanosecond TimestampType): floor-divided to µs — bit-identical to
    *    DuckDB's truncating read of the same file;
    *  - TIMESTAMP_NTZ (files written by other engines, e.g. DuckDB COPY),
    *    which `unix_micros` rejects: cast under the session's UTC zone;
    *  - TIMESTAMP: read directly.
    */
  def tsMicros(df: DataFrame): Column =
    df.schema("ts").dataType match {
      case LongType         => expr("ts div 1000")
      case TimestampNTZType => unix_micros(col("ts").cast(TimestampType))
      case _                => unix_micros(col("ts"))
    }

  private def normalizeNanos(df: DataFrame): DataFrame =
    if (df.schema("ts").dataType == TimestampType) df
    else df.withColumn("ts", timestamp_micros(tsMicros(df)))

  // WIDEN POLICY (r22 remeasure of the r21 repair — the verdict's
  // "recover the widen tax" item). The widen exchange pays off exactly
  // when HEAVY PER-ROW WORK follows the scan (record synthesis, archive
  // decode, tokenize-into-retrieval pipelines): every r20→r21 winner was
  // a documents-based extract/parse query (q116 −4.3 s, q135 −3.1,
  // q147 −3.0, …). For pipelines whose cost lives in their OWN
  // aggregation/join shuffles the same exchange measured as a pure tax
  // (the relational/session/window family regressed +0.3…+1.3 s each,
  // ~18 s composite). So:
  //   - documents and embeddings (the per-row-heavy corpora) WIDEN by
  //     default, with a narrow opt-out for the measured-tax operators;
  //   - the relational tables and events stay NARROW (the one
  //     events-based per-row-heavy pipeline, q17's message parse,
  //     already carries its own event_id repartition).
  // At 100 TB every variant is identical — the widen is the identity for
  // any scan at least as wide as the cluster — so the split trades
  // nothing at scale and recovers the local regressions.
  def lineitem(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "lineitem")
  def lineitemWide(spark: SparkSession, dir: String): DataFrame =
    widen(apply(spark, dir, "lineitem"), "l_orderkey")
  def orders(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame    = normalizeNanos(apply(spark, dir, "events"))
  def documents(spark: SparkSession, dir: String): DataFrame = widen(apply(spark, dir, "documents"), "doc_id")
  def documentsNarrow(spark: SparkSession, dir: String): DataFrame =
    apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = widen(apply(spark, dir, "embeddings"), "vec_id")
}
