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
  * BUCKET instead of the raw word (`nbTrainHashed` — same plan,
  * `nBuckets`-bounded model no matter the vocabulary); q131 ships both
  * models side by side so the bucketed path's bias is measured against
  * exact truth under the oracle hash.
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

  /** HASHING-TRICK bucket of a word: `int(first 4 hex digits of
    * md5(word)) % nBuckets` — the portable md5 fold both engines replay
    * digit-for-digit (the q101 Bloom discipline). This is the 100 TB
    * model column: raw-word vocabularies are unbounded at crawl scale,
    * but the bucket bounds the model at `nBuckets` rows — a fixed-size
    * broadcast no matter the corpus — at the price of collisions
    * merging counts (the hashing trick's declared bias; Weinberger et
    * al. 2009).
    */
  private[graft] def bucketOf(w: Column, nBuckets: Int): Column =
    conv(substring(md5(w), 1, 4), 16, 10).cast("long") % nBuckets

  /** Train the NB log-ratio model over an arbitrary token key:
    * (key, contr) with contr = ilog2(c_pos+1) − ilog2(c_neg+1).
    */
  private def nbTrainBy(
      pos: DataFrame, neg: DataFrame,
      key: Column => Column, keyName: String): DataFrame = {
    def counts(df: DataFrame, as: String) = df
      .select(explode(words(col("text"))).as("w0"))
      .select(key(col("w0")).as(keyName))
      .groupBy(col(keyName)).agg(count(lit(1)).as(as))
    counts(pos, "c_pos").join(counts(neg, "c_neg"), Seq(keyName), "full_outer")
      .select(col(keyName),
        (ilog2(coalesce(col("c_pos"), lit(0L)) + 1) -
          ilog2(coalesce(col("c_neg"), lit(0L)) + 1)).as("contr"))
  }

  /** Raw-word model — exact, vocabulary-sized. */
  def nbTrain(pos: DataFrame, neg: DataFrame): DataFrame =
    nbTrainBy(pos, neg, identity, "word")

  /** Bucketed model — `nBuckets` rows regardless of vocabulary; the
    * scale path for unbounded crawl vocabularies.
    */
  def nbTrainHashed(pos: DataFrame, neg: DataFrame, nBuckets: Int = 1024): DataFrame =
    nbTrainBy(pos, neg, bucketOf(_, nBuckets), "bucket")

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
    * negative class), score the held-out quarter both ways under BOTH
    * models — the exact raw-word model and the 1024-bucket
    * hashing-trick model (the 100 TB path) — every count, score, and
    * verdict oracle-replayed. One token scan feeds both scorings: the
    * exploded tokens carry their bucket and join the two broadcast
    * models before a single per-doc aggregate.
    */
  def q131NbQuality(spark: SparkSession, dir: String): DataFrame = {
    val nBuckets = 1024
    // narrow scan (r22): measured widen tax (see Tables widen-policy note)
    val docs = Tables.documentsNarrow(spark, dir).where(col("lang") === "en")
    val train = docs.where(col("doc_id") % 4 =!= 0)
    val trainNeg =
      train.select(col("doc_id"), reversedText(col("text")).as("text"))
    val model = nbTrain(train, trainNeg)
    val modelH = nbTrainHashed(train, trainNeg, nBuckets)
      .withColumnRenamed("contr", "hcontr")
    val heldOut = docs.where(col("doc_id") % 4 === 0)
    val eval = heldOut
      .select(col("doc_id"), col("text"), lit(true).as("is_clean"))
      .unionByName(heldOut.select(
        (col("doc_id") + 1000000000L).as("doc_id"),
        reversedText(col("text")).as("text"), lit(false).as("is_clean")))
    eval
      .select(col("doc_id"), explode(words(col("text"))).as("word"))
      .withColumn("bucket", bucketOf(col("word"), nBuckets))
      .join(broadcast(model), Seq("word"), "left")
      .join(broadcast(modelH), Seq("bucket"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("contr"), lit(0L))).as("score"),
        sum(coalesce(col("hcontr"), lit(0L))).as("hscore"))
      .join(eval.select(col("doc_id"), col("is_clean")), Seq("doc_id"))
      .select(col("doc_id"), col("is_clean"), col("n_tokens"),
        col("score"), (col("score") > 0).as("pred"),
        col("hscore"), (col("hscore") > 0).as("hpred"))
      .orderBy(col("doc_id"))
  }
}
