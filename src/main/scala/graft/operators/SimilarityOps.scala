package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns: exact cosine top-k as the
  * baseline (broadcast the small query side — the only intentional
  * nested-loop join in the engine) and a signed-random-projection LSH
  * variant whose candidate generation is a bucket equi-join.
  *
  * Scale notes (100 TB): the baseline is O(|queries|·|corpus|) and only
  * valid for small query sets; the LSH path shuffles once on bucket keys
  * and once on ids for verification. `tables`×`bitsPerTable` trades recall
  * against candidate volume — on well-clustered corpora few-bit tables
  * prune aggressively; on adversarially uniform data (like this synthetic
  * corpus) LSH degrades gracefully toward exhaustive comparison, which is
  * the correct behavior for genuinely indistinguishable neighbors.
  */
object SimilarityOps {

  /** Exact dot product over array<double> columns via the native
    * `DotProduct` expression (one primitive loop; accumulation order is
    * identical to the builtin zip_with+aggregate form, parity-tested).
    */
  def dot(a: Column, b: Column): Column = graft.functions.DotProduct(a, b)

  /** Pure-builtin reference form (slow path; parity-test oracle). */
  private[graft] def dotBuiltins(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  private def corpus(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .repartition(col("vec_id")) // spread cosine/SRP compute over all cores
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** Every 50th vector doubles as a query — a small designated query set. */
  private def queriesOf(c: DataFrame): DataFrame =
    c.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))

  /** Brute-force exact top-k: corpus × broadcast(queries), ranked per query
    * with vec_id as the deterministic tie-break. Norms are precomputed per
    * row (not per pair): only the dot product runs inside the join.
    */
  def bruteForceTopK(c: DataFrame, q: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    val cN = c.withColumn("v_norm", sqrt(dot(col("v"), col("v"))))
    val qN = q.withColumn("qv_norm", sqrt(dot(col("qv"), col("qv"))))
    cN.crossJoin(broadcast(qN))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qv_norm") * col("v_norm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"))
  }

  /** q23: oracle-checked exact ANN baseline — top-10 neighbors for each
    * designated query vector.
    */
  def q23AnnTopK(spark: SparkSession, dir: String): DataFrame = {
    val c = corpus(spark, dir)
    bruteForceTopK(c, queriesOf(c), 10)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Default embedding dimensionality of the corpus tables. */
  val DefaultDim = 64

  /** Deterministic hyperplane component in [-1, 1] (shared SplitMix64
    * constants from DedupOps) — computed driver-side so the planes reach
    * the executors as literal constant arrays (zero runtime hashing).
    */
  private def plane(p: Int, dim: Int): Seq[Double] =
    (0 until dim).map(j =>
      DedupOps.splitmix((p.toLong << 32) | j.toLong).toDouble / 9.223372036854776e18)

  private def planeDot(v: Column, p: Int, dim: Int): Column =
    dot(v, typedlit(plane(p, dim)))

  /** SRP-LSH bucket keys: `tables` independent tables, each packing
    * `bitsPerTable` hyperplane signs into one key (table index mixed in so
    * buckets never collide across tables). Hyperplanes are literal
    * constants; each key is `bitsPerTable` codegen'd dot products. `dim`
    * MUST cover the vectors' dimensionality — components past `dim` would
    * be silently ignored by the truncating dot product, collapsing recall.
    */
  def srpBuckets(v: Column, tables: Int, bitsPerTable: Int, dim: Int = DefaultDim): Column =
    array((0 until tables).map { t =>
      val key = (0 until bitsPerTable).foldLeft(lit(0L)) { (acc, b) =>
        acc * 2 + when(planeDot(v, t * bitsPerTable + b, dim) > 0, 1L).otherwise(0L)
      }
      struct(lit(t).as("t"), key.as("key"))
    }: _*)

  /** LSH ANN: bucket corpus and queries, candidate pairs from the bucket
    * equi-join, exact cosine + rank on candidates only.
    */
  def annTopKLsh(
      c: DataFrame,
      q: DataFrame,
      k: Int,
      tables: Int = 24,
      bitsPerTable: Int = 3,
      dim: Int = DefaultDim): DataFrame = {
    val cB = c.select(col("vec_id"), col("v"),
      explode(srpBuckets(col("v"), tables, bitsPerTable, dim)).as("bucket"))
      .select(col("vec_id"), col("bucket"))
    val qB = q.select(col("query_id"),
      explode(srpBuckets(col("qv"), tables, bitsPerTable, dim)).as("bucket"))
      .select(col("query_id"), col("bucket"))
    val candidates = qB.join(cB, qB("bucket") === cB("bucket") &&
        col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    candidates
      .join(q.withColumn("qv_norm", sqrt(dot(col("qv"), col("qv")))), Seq("query_id"))
      .join(c.withColumn("v_norm", sqrt(dot(col("v"), col("v")))), Seq("vec_id"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qv_norm") * col("v_norm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"))
  }

  /** q24: the LSH scale path (rows-only check; the recall gate vs the exact
    * baseline lives in ScalaTest).
    */
  def q24AnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val c = corpus(spark, dir)
    annTopKLsh(c, queriesOf(c), 10)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Embedding-cosine near-dup: all pairs above a cosine threshold — exact
    * all-pairs baseline. No broadcast hint: the planner/AQE picks the
    * strategy (BNLJ while one side fits the broadcast threshold; an exact
    * all-pairs spec degenerates to a cartesian beyond that by definition).
    * The scale path is `cosineNearDupLsh` below.
    */
  def cosineNearDup(c: DataFrame, threshold: Double): DataFrame = {
    val cN = c.withColumn("v_norm", sqrt(dot(col("v"), col("v"))))
    val right = cN.select(col("vec_id").as("vec_b"), col("v").as("vb"),
      col("v_norm").as("vb_norm"))
    // membership only — the raw score's last-ulp depends on each engine's
    // accumulation order, so exposing it would make exact value comparison
    // flaky while adding nothing to the dedup decision
    cN.join(right, col("vec_id") < col("vec_b"))
      .withColumn("cos", dot(col("v"), col("vb")) / (col("v_norm") * col("vb_norm")))
      .filter(col("cos") >= threshold)
      .select(col("vec_id").as("vec_a"), col("vec_b"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** Scale path for cosine near-dup: SRP-LSH bucket equi-join candidates,
    * exact cosine verification — subquadratic candidate volume, recall
    * governed by (tables, bitsPerTable) exactly as in `annTopKLsh`.
    */
  def cosineNearDupLsh(
      c: DataFrame,
      threshold: Double,
      tables: Int = 24,
      bitsPerTable: Int = 3,
      dim: Int = DefaultDim): DataFrame = {
    val cB = c.select(col("vec_id"),
      explode(srpBuckets(col("v"), tables, bitsPerTable, dim)).as("bucket"))
    val candidates = cB.as("a")
      .join(cB.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    val cN = c.withColumn("v_norm", sqrt(dot(col("v"), col("v"))))
    val left = cN.select(col("vec_id").as("vec_a"), col("v").as("va"), col("v_norm").as("va_norm"))
    val right = cN.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("v_norm").as("vb_norm"))
    candidates.join(left, Seq("vec_a")).join(right, Seq("vec_b"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("va_norm") * col("vb_norm")))
      .filter(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** q28: cosine near-dup pairs at >= 0.4 (the corpus' near-random
    * embeddings top out near 0.48, so the threshold sits in populated
    * range while staying far from any rank boundary noise).
    */
  def q28CosineNearDup(spark: SparkSession, dir: String): DataFrame =
    cosineNearDup(corpus(spark, dir), 0.4)
}
