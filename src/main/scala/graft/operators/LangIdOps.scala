package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-document language identification — the classifier every
  * training-data pipeline runs before quality scoring (CCNet/RefinedWeb
  * style). Char-TRIGRAM naive Bayes over the q131 hashing-trick bucket
  * space: script classes alone (q157) cannot separate same-script
  * languages (en/fr/de/es are all Latin), but their word-internal
  * trigram distributions do.
  *
  * Pipeline shape (Spark-first, 100 TB):
  *   documents → words → padded char trigrams → md5 bucket (the q131
  *   portable fold, `NBuckets` = 4096) → per-(lang, bucket) counts on
  *   the TRAINING split (bounded: 6 langs × 4096 buckets regardless of
  *   corpus size) → Laplace-smoothed log-probs → BROADCAST model →
  *   per-document score join → argmax via `max_by`.
  * Shuffles: the training count group-by is model-sized; scoring
  * exchanges (doc, bucket) counts then one doc-sized argmax group-by.
  * The model is a fixed-size broadcast no matter the corpus — the
  * hashing trick's whole point at crawl scale.
  *
  * The q170 corpus is CONSTRUCTED per doc_id from six 24-word tables
  * (four Latin-script languages plus Cyrillic and Greek), so the true
  * label is doc_id arithmetic and the oracle replays the verdicts
  * exactly: the gate is 100% agreement `pred_lang == true_lang`,
  * including on the held-out quarter (`doc_id % 4 == 1`) the model
  * never trained on.
  */
object LangIdOps {

  private[graft] val NBuckets = 4096

  /** Six deterministic word tables. Within one script the languages
    * must be separated by trigram statistics, not by alphabet.
    */
  private[graft] val Langs: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("über", "können", "straße", "der", "die", "das", "und",
      "nicht", "schön", "müssen", "zwischen", "wichtig", "deutsch",
      "sprache", "weil", "schreiben", "tatsächlich", "größe", "während",
      "plötzlich", "natürlich", "vielleicht", "geschichte", "verstehen"),
    "el" -> Seq("και", "είναι", "αυτό", "γλώσσα", "ελληνικά", "πολύ",
      "μεγάλο", "χρόνος", "άνθρωπος", "θάλασσα", "ουρανός", "φιλοσοφία",
      "δημοκρατία", "ιστορία", "παράδειγμα", "κατάσταση", "πρόβλημα",
      "κυβέρνηση", "οικογένεια", "ερώτηση", "απάντηση", "βιβλίο",
      "δουλειά", "σήμερα"),
    "en" -> Seq("the", "and", "through", "language", "english", "very",
      "large", "time", "people", "because", "thought", "knowledge",
      "question", "answer", "government", "history", "example",
      "situation", "problem", "family", "yesterday", "tomorrow",
      "writing", "understanding"),
    "es" -> Seq("años", "señor", "está", "que", "los", "una", "pero",
      "también", "después", "corazón", "niño", "mañana", "pregunta",
      "respuesta", "gobierno", "historia", "ejemplo", "situación",
      "problema", "familia", "trabajo", "siempre", "lengua", "español"),
    "fr" -> Seq("été", "être", "où", "déjà", "les", "des", "une",
      "français", "très", "beaucoup", "aujourd'hui", "question",
      "réponse", "gouvernement", "histoire", "exemple", "situation",
      "problème", "famille", "travail", "toujours", "langue", "château",
      "garçon"),
    "ru" -> Seq("и", "это", "язык", "русский", "очень", "большой",
      "время", "человек", "потому", "мысль", "знание", "вопрос",
      "ответ", "правительство", "история", "пример", "положение",
      "проблема", "семья", "работа", "всегда", "сегодня", "завтра",
      "книга"))

  private[graft] val LangNames: Seq[String] = Langs.map(_._1)

  /** Constructed corpus: per doc 30 words from its language's table,
    * chosen by `(doc_id·7 + j·13) mod 24` — the oracle's arithmetic.
    */
  private[graft] def syntheticLangText(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tables = Langs.map(_._2)
    val langNames = LangNames
    docs.select(col("doc_id")).as[Long].map { id =>
      val li = (id % 6).toInt
      val t = tables(li)
      val ws = (0 until 30).map(j => t(((id * 7 + j * 13) % 24).toInt))
      (id, langNames(li), ws.mkString(" "))
    }.toDF("doc_id", "true_lang", "text")
  }

  /** Padded char trigrams of each whitespace word in column `textCol`
    * (the `_word_` padding makes word boundaries part of the signal).
    */
  private def gramsOf(textCol: String) = expr(
    s"flatten(transform(transform(split(lower($textCol), ' '), " +
      "w -> concat('_', w, '_')), " +
      "p -> transform(sequence(1, greatest(length(p) - 2, 1)), " +
      "i -> substring(p, i, 3))))")

  /** Train the 6×`NBuckets` smoothed log-prob model on `train` rows
    * (`true_lang`, `text`): one model-sized group-by, then per-lang
    * totals join; every bucket present for every language (Laplace —
    * the `langs × buckets` cross is the one DOCUMENTED non-equi join,
    * bounded at 6×`NBuckets` rows regardless of corpus size and
    * plan-pinned in Round16PlanSpec).
    */
  private[graft] def trainModel(train: DataFrame): DataFrame = {
    val spark = train.sparkSession
    val counts = train
      .select(col("true_lang").as("lang"), explode(gramsOf("text")).as("g"))
      .select(col("lang"), ClassifyOps.bucketOf(col("g"), NBuckets).as("bucket"))
      .groupBy(col("lang"), col("bucket")).agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(col("lang")).agg(sum(col("c")).as("n"))
    val buckets = counts.select(col("bucket")).distinct()
    val langs = spark.createDataFrame(
      spark.sparkContext.parallelize(LangNames.map(org.apache.spark.sql.Row(_)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("lang",
          org.apache.spark.sql.types.StringType))))
    langs.crossJoin(buckets)
      .join(counts, Seq("lang", "bucket"), "left")
      .join(totals, Seq("lang"))
      .select(col("lang"), col("bucket"),
        (log(coalesce(col("c"), lit(0L)) + 1) -
          log(col("n") + lit(NBuckets))).as("logp"))
  }

  /** Score (`doc_id`, `text`) rows under a trained model: per-doc
    * bucket counts join the BROADCAST model, sum per language, argmax
    * via `max_by` (ties break to the lexicographically larger lang —
    * deterministic).
    */
  private[graft] def predict(docs: DataFrame, model: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(gramsOf("text")).as("g"))
      .select(col("doc_id"), ClassifyOps.bucketOf(col("g"), NBuckets).as("bucket"))
      .groupBy(col("doc_id"), col("bucket")).agg(count(lit(1)).as("dc"))
      .join(broadcast(model), Seq("bucket"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("dc") * col("logp")).as("score"))
      .groupBy(col("doc_id"))
      .agg(expr("max_by(lang, struct(score, lang))").as("pred_lang"))

  /** q170: language identification end to end — train the hashed NB
    * model on the `doc_id % 4 != 1` split of the constructed
    * six-language corpus, predict EVERY document (held-out quarter
    * included), and emit the verdicts next to the planted truth; the
    * oracle replays both from doc_id arithmetic — the gate is exact
    * agreement, which script classes alone (q157) could not deliver
    * for the four Latin-script languages.
    */
  def q170LangId(spark: SparkSession, dir: String): DataFrame = {
    val corpus = syntheticLangText(Tables.documents(spark, dir))
    val model = trainModel(corpus.filter(col("doc_id") % 4 =!= 1))
    corpus
      .join(predict(corpus, model), Seq("doc_id"))
      .select(col("doc_id"), col("true_lang"), col("pred_lang"),
        (col("doc_id") % 4 =!= 1).as("is_train"),
        lit(30L).as("n_words"))
      .orderBy(col("doc_id"))
  }
}
