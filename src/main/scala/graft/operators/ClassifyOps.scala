package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-based quality classification — the fastText-style linear
  * filter every major pipeline runs ("does this page look like the
  * reference corpus?"), in its aggregative, exactly-replayable form: a
  * multinomial NAIVE BAYES over word counts. Training is ONE pass of
  * grouped counting (no sequential epochs — the set-oriented analog of
  * the linear classifier, and the reason the whole model fits the
  * oracle-replay discipline), scoring is a per-document sum of integer
  * fixed-point log-likelihood ratios with Laplace smoothing:
  *
  *   score(d) = Σ_tokens [ ilog2(c_pos(w)+1) − ilog2(c_neg(w)+1) ]
  *
  * with `ilog2(x) = length(bin(x)) − 1` (the exact floor-log2 of
  * q124's discipline). The class-total terms cancel EXACTLY here
  * because the negative class is a token-count-preserving transform of
  * the positive corpus (see below), so the ratio needs no denominators
  * — declared, not assumed. Unseen words contribute 0 (ilog2(1) = 0 on
  * both sides). Scale shape: training is two grouped counts over the
  * train corpus (vocabulary-sized model); apply is one broadcast join
  * + one per-doc sum. At 100 TB the model column is the hashing-trick
  * bucket instead of the raw word — same plan, bounded vocab.
  *
  * The q131 corpus: positives are the real `en` documents; negatives
  * are their WORD-REVERSED twins (per-word `reverse` — deterministic,
  * token-count-preserving, vocabulary-disjoint except palindromes,
  * which contribute exactly 0 by symmetry). Train on doc_id % 4 != 0,
  * evaluate on the held-out quarter (real + reversed, reversed ids
  * offset by 10^9), so the registered output carries known truth
  * labels next to replayed scores.
  */
object ClassifyOps {

  private def ilog2(c: Column): Column = (length(bin(c)) - 1).cast("long")
  private def words(t: Column): Column = split(lower(t), " ")
  private def reversedText(t: Column): Column =
    concat_ws(" ", transform(words(t), w => reverse(w)))

  /** Train the NB log-ratio model: (word, contr) with
    * contr = ilog2(c_pos+1) − ilog2(c_neg+1).
    */
  def nbTrain(pos: DataFrame, neg: DataFrame): DataFrame = {
    def counts(df: DataFrame, as: String) = df
      .select(explode(words(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as(as))
    counts(pos, "c_pos").join(counts(neg, "c_neg"), Seq("word"), "full_outer")
      .select(col("word"),
        (ilog2(coalesce(col("c_pos"), lit(0L)) + 1) -
          ilog2(coalesce(col("c_neg"), lit(0L)) + 1)).as("contr"))
  }

  /** Score documents under a trained model: per doc the token count,
    * the summed integer log-ratio, and the verdict (score > 0).
    */
  def nbScore(docs: DataFrame, model: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(words(col("text"))).as("word"))
      .join(broadcast(model), Seq("word"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("contr"), lit(0L))).as("score"))
      .withColumn("pred", col("score") > 0)

  /** q131: train on 3/4 of the en corpus (+ reversed twins as the
    * negative class), score the held-out quarter both ways — every
    * count, score, and verdict oracle-replayed.
    */
  def q131NbQuality(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).where(col("lang") === "en")
    val train = docs.where(col("doc_id") % 4 =!= 0)
    val model = nbTrain(
      train,
      train.select(col("doc_id"), reversedText(col("text")).as("text")))
    val heldOut = docs.where(col("doc_id") % 4 === 0)
    val eval = heldOut
      .select(col("doc_id"), col("text"), lit(true).as("is_clean"))
      .unionByName(heldOut.select(
        (col("doc_id") + 1000000000L).as("doc_id"),
        reversedText(col("text")).as("text"), lit(false).as("is_clean")))
    nbScore(eval.select(col("doc_id"), col("text")), model)
      .join(eval.select(col("doc_id"), col("is_clean")), Seq("doc_id"))
      .select(col("doc_id"), col("is_clean"), col("n_tokens"),
        col("score"), col("pred"))
      .orderBy(col("doc_id"))
  }
}
