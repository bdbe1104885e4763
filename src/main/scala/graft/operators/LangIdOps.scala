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

  /** Six more trained languages (q180 breadth): two Romance, two
    * Germanic, one Slavic, one Turkic — every new Latin-script table
    * must separate from the q170 four AND from each other by trigram
    * statistics alone.
    */
  private[graft] val LangsMore: Seq[(String, Seq[String])] = Seq(
    "it" -> Seq("però", "città", "perché", "gli", "che", "non", "anche",
      "più", "essere", "tempo", "persone", "domanda", "risposta",
      "governo", "storia", "esempio", "situazione", "problema",
      "famiglia", "lavoro", "sempre", "lingua", "italiano", "ragazzo"),
    "nl" -> Seq("het", "een", "niet", "ook", "maar", "voor", "zijn",
      "worden", "mensen", "tijd", "vraag", "antwoord", "regering",
      "geschiedenis", "voorbeeld", "situatie", "probleem", "familie",
      "werk", "altijd", "taal", "nederlands", "jongen", "schrijven"),
    "pl" -> Seq("jest", "nie", "się", "język", "polski", "bardzo",
      "duży", "czas", "człowiek", "ponieważ", "myśl", "wiedza",
      "pytanie", "odpowiedź", "rząd", "przykład", "sytuacja",
      "kłopot", "rodzina", "praca", "zawsze", "dzisiaj", "jutro",
      "książka"),
    "pt" -> Seq("não", "são", "uma", "mas", "também", "depois",
      "coração", "criança", "amanhã", "pergunta", "resposta",
      "governo", "história", "exemplo", "situação", "problema",
      "família", "trabalho", "sempre", "língua", "português",
      "menino", "ação", "coisa"),
    "sv" -> Seq("och", "är", "inte", "också", "men", "för", "vara",
      "människor", "tid", "fråga", "svar", "regering", "exempel",
      "läge", "bekymmer", "familj", "arbete", "alltid", "språk",
      "svenska", "pojke", "skriva", "förstå", "idag"),
    "tr" -> Seq("ve", "bir", "değil", "için", "çok", "büyük", "zaman",
      "insan", "çünkü", "düşünce", "bilgi", "soru", "cevap",
      "hükümet", "tarih", "örnek", "durum", "sorun", "aile",
      "çalışma", "daima", "bugün", "yarın", "kitap"))

  /** The q180 trained dozen, alphabetical (the oracle's `doc_id % 14`
    * axis runs over these twelve then the two foreign tables).
    */
  private[graft] val Langs12: Seq[(String, Seq[String])] =
    (Langs ++ LangsMore).sortBy(_._1)

  /** OUT-OF-MODEL languages (never trained): documents built from
    * these must land the calibrated `und` verdict — a gate that always
    * answers mislabels everything outside its training set.
    */
  private[graft] val LangsForeign: Seq[(String, Seq[String])] = Seq(
    "fi" -> Seq("ja", "on", "ei", "myös", "mutta", "olla", "ihminen",
      "aika", "kysymys", "vastaus", "hallitus", "esimerkki", "tilanne",
      "ongelma", "perhe", "työ", "aina", "kieli", "suomi", "poika",
      "kirjoittaa", "ymmärtää", "tänään", "huomenna"),
    "eo" -> Seq("kaj", "estas", "ne", "ankaŭ", "sed", "por", "esti",
      "homoj", "tempo", "demando", "respondo", "registaro", "historio",
      "ekzemplo", "situacio", "problemo", "familio", "laboro", "ĉiam",
      "lingvo", "esperanto", "knabo", "skribi", "kompreni"))

  /** Constructed corpus over an arbitrary table list: per doc 30 words
    * from table `doc_id mod |tables|`, chosen by
    * `(doc_id·7 + j·13) mod 24` — the oracle's arithmetic. `_2` is the
    * TABLE's language (the planted truth before any und-folding).
    */
  private[graft] def syntheticTextOf(
      docs: DataFrame, langTables: Seq[(String, Seq[String])]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tables = langTables.map(_._2)
    val names = langTables.map(_._1)
    val nl = langTables.length
    docs.select(col("doc_id")).as[Long].map { id =>
      val li = (id % nl).toInt
      val t = tables(li)
      val ws = (0 until 30).map(j => t(((id * 7 + j * 13) % 24).toInt))
      (id, names(li), ws.mkString(" "))
    }.toDF("doc_id", "true_lang", "text")
  }

  /** The q170 six-language corpus (fixed axis `doc_id % 6`). */
  private[graft] def syntheticLangText(docs: DataFrame): DataFrame =
    syntheticTextOf(docs, Langs)

  /** Padded char trigrams of each whitespace word in column `textCol`
    * (the `_word_` padding makes word boundaries part of the signal).
    */
  private[graft] def gramsOf(textCol: String) = expr(
    s"flatten(transform(transform(split(lower($textCol), ' '), " +
      "w -> concat('_', w, '_')), " +
      "p -> transform(sequence(1, greatest(length(p) - 2, 1)), " +
      "i -> substring(p, i, 3))))")

  /** gramsOf ∘ bucketOf, fused into the native kernel (r21): the nested
    * interpreted transforms plus a per-gram md5 projection were the
    * measured cost of q170/q180; bucket stream bit-identical to
    * `explode(gramsOf) → ClassifyOps.bucketOf` (parity-pinned in
    * TextGramsSpec).
    */
  private def gramBucketsOf(textCol: String): org.apache.spark.sql.Column =
    graft.functions.CharTrigramBuckets(split(lower(col(textCol)), " "), NBuckets)

  /** Train the 6×`NBuckets` smoothed log-prob model on `train` rows
    * (`true_lang`, `text`): one model-sized group-by, then per-lang
    * totals join; every bucket present for every language (Laplace —
    * the `langs × buckets` cross is the one DOCUMENTED non-equi join,
    * bounded at 6×`NBuckets` rows regardless of corpus size and
    * plan-pinned in Round16PlanSpec).
    */
  private[graft] def trainModel(
      train: DataFrame, langNames: Seq[String] = LangNames): DataFrame = {
    val spark = train.sparkSession
    val counts = train
      .select(col("true_lang").as("lang"),
        explode(gramBucketsOf("text")).as("bucket"))
      .groupBy(col("lang"), col("bucket")).agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(col("lang")).agg(sum(col("c")).as("n"))
    val buckets = counts.select(col("bucket")).distinct()
    val langs = spark.createDataFrame(
      spark.sparkContext.parallelize(langNames.map(org.apache.spark.sql.Row(_)), 1),
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
      .select(col("doc_id"), explode(gramBucketsOf("text")).as("bucket"))
      .groupBy(col("doc_id"), col("bucket")).agg(count(lit(1)).as("dc"))
      .join(broadcast(model), Seq("bucket"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("dc") * col("logp")).as("score"))
      .groupBy(col("doc_id"))
      .agg(expr("max_by(lang, struct(score, lang))").as("pred_lang"))

  /** `predict` with CALIBRATED ABSTENTION: a verdict row for EVERY
    * input doc (never a silent loss), `und` when the top-two score
    * margin per trigram falls under `tauPerGram` nats OR the doc
    * yielded no scorable bucket at all. The margin normalizes by the
    * doc's gram count so the threshold is length-free; ties inside the
    * top-two sort break to the lexicographically larger lang (the
    * `max_by` convention).
    */
  private[graft] def predictAbstain(
      docs: DataFrame, model: DataFrame, tauPerGram: Double): DataFrame = {
    val db = docs
      .select(col("doc_id"), explode(gramBucketsOf("text")).as("bucket"))
      .groupBy(col("doc_id"), col("bucket")).agg(count(lit(1)).as("dc"))
    // the per-doc gram COUNT needs no second trigram pass (r22): a word
    // of length L yields exactly greatest(L, 1) padded trigrams (the
    // `_word_` padding adds 2 chars, the window subtracts 2;
    // sequence(1, greatest(len-2, 1)) floors at one), so
    // Σ dc == Σ_words greatest(length(w), 1) — a cheap per-row fold
    // over ~30 words instead of re-running the explode + per-gram md5 +
    // (doc, bucket) aggregate that previously computed `grams` (the
    // measured cost of the langid family; one of q180's three
    // gram-explode passes eliminated)
    val grams = docs.select(col("doc_id"),
      expr("aggregate(split(lower(text), ' '), 0L, " +
        "(acc, w) -> acc + cast(greatest(length(w), 1) AS bigint))")
        .as("n_grams"))
    val verdicts = db
      .join(broadcast(model), Seq("bucket"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("dc") * col("logp")).as("score"))
      .groupBy(col("doc_id"))
      .agg(expr("array_sort(collect_list(struct(score, lang)))").as("sl"))
      .join(grams, Seq("doc_id"))
      .select(col("doc_id"),
        element_at(col("sl"), -1).getField("lang").as("top_lang"),
        ((element_at(col("sl"), -1).getField("score") -
          element_at(col("sl"), -2).getField("score")) / col("n_grams"))
          .as("margin"))
      .select(col("doc_id"),
        when(col("margin") >= tauPerGram, col("top_lang"))
          .otherwise(lit("und")).as("pred_lang"),
        col("margin"))
    docs.select(col("doc_id")).distinct()
      .join(verdicts, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("pred_lang"), lit("und")).as("pred_lang"),
        coalesce(col("margin"), lit(0.0)).as("margin"))
  }

  /** q170: language identification end to end — train the hashed NB
    * model on the `doc_id % 4 != 1` split of the constructed
    * six-language corpus, predict EVERY document (held-out quarter
    * included), and emit the verdicts next to the planted truth; the
    * oracle replays both from doc_id arithmetic — the gate is exact
    * agreement, which script classes alone (q157) could not deliver
    * for the four Latin-script languages.
    */
  def q170LangId(spark: SparkSession, dir: String): DataFrame = {
    // r22 note: pinning the constructed corpus (persist + eager count)
    // was measured SLOWER than recomputing the synthesis map per
    // consumer (4.2 -> 4.9 s at sf0.1) — cache write + row
    // deserialization cost more than the map. Left on recompute.
    val corpus = syntheticLangText(Tables.documents(spark, dir))
    val model = trainModel(corpus.filter(col("doc_id") % 4 =!= 1))
    // LEFT join + typed `und`: a doc whose buckets were all unseen in
    // training surfaces with an explicit unknown verdict instead of
    // silently vanishing from the output (the no-silent-loss
    // discipline; on this corpus every doc scores, so the oracle is
    // unchanged)
    corpus
      .join(predict(corpus, model), Seq("doc_id"), "left")
      .select(col("doc_id"), col("true_lang"),
        coalesce(col("pred_lang"), lit("und")).as("pred_lang"),
        (col("doc_id") % 4 =!= 1).as("is_train"),
        lit(30L).as("n_words"))
      .orderBy(col("doc_id"))
  }

  /** The q180 abstention threshold: nats of top-two margin per trigram
    * a verdict must clear. Measured on the constructed corpora the
    * in-model margins sit far above 1.0 and the out-of-model (fi/eo)
    * margins far below — the calibration spec pins both sides of the
    * gap.
    */
  private[graft] val TauPerGram = 1.0

  /** q180: language identification with BREADTH + ABSTENTION — twelve
    * trained languages (the q170 six plus it/nl/pl/pt/sv/tr: seven
    * Latin-script languages that only trigram statistics separate) and
    * two PLANTED OUT-OF-MODEL languages (fi/eo) whose documents must
    * land the calibrated `und` verdict; trained docs keep the
    * `doc_id % 4 != 1` held-out discipline. The oracle replays every
    * verdict from the `doc_id % 14` axis — a misfire on either side of
    * the abstention threshold changes rows.
    */
  def q180LangIdUnd(spark: SparkSession, dir: String): DataFrame = {
    val all = Langs12 ++ LangsForeign
    val trained = Langs12.map(_._1).toSet
    val corpus = syntheticTextOf(Tables.documents(spark, dir), all) // see q170
    val model = trainModel(
      corpus.filter(col("true_lang").isInCollection(trained) &&
        col("doc_id") % 4 =!= 1),
      Langs12.map(_._1))
    val truth = when(col("true_lang").isInCollection(trained),
      col("true_lang")).otherwise(lit("und"))
    corpus
      .join(predictAbstain(corpus, model, TauPerGram), Seq("doc_id"), "left")
      .select(col("doc_id"), truth.as("true_lang"),
        coalesce(col("pred_lang"), lit("und")).as("pred_lang"),
        (col("true_lang").isInCollection(trained) &&
          col("doc_id") % 4 =!= 1).as("is_train"))
      .orderBy(col("doc_id"))
  }
}
