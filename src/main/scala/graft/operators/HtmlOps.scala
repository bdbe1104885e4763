package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HTML → text extraction: the FRONT DOOR of a web-crawl training-data
  * pipeline. Everything in `TextOps`/`CurateOps` (Gopher rules, LM
  * gates, dedup) assumes a clean `text` column; a real crawl's first
  * operator is markup removal — script/style/comment elision, tag
  * stripping, entity decoding, block segmentation — and until it runs,
  * none of the quality machinery applies.
  *
  * The rule set is DETERMINISTIC BY CONSTRUCTION so a SQL oracle replays
  * it end-to-end (the q69 constructed-corpus discipline): a fixed chain
  * of regex rewrites in the Java/RE2 COMMON DIALECT (inline `(?is)`
  * flags, non-greedy spans, character classes — no lookbehind, no
  * backrefs), literal entity replaces, and split/trim/filter block
  * segmentation, all per-row codegen built-ins — no UDFs, no shuffle.
  *
  * Extraction semantics (each deliberate, each pinned by spec + oracle):
  *   1. `<script…>…</script…>` and `<style…>…</style…>` elements drop
  *      WITH their content FIRST (a raw `<` inside script text cannot
  *      resurrect as markup because the whole element is elided), THEN
  *      `<!-- … -->` comments — so the legacy script-hiding idiom (a
  *      bare `<!--` inside a script whose `-->` lies outside) cannot
  *      swallow the `</script>` tag plus real text. An UNCLOSED
  *      script/style keeps its text — the content-preserving fallback
  *      for truncated crawls (deterministic; the fuzz spec pins it).
  *   2. Block-level tags (p, div, br, h1–h6, li, ul, ol, tr, td, th,
  *      table, blockquote, section, article, header, footer, pre,
  *      title) become newlines — the block boundaries; every remaining
  *      tag strips to a space (inline tags never split a block).
  *   3. Entities decode AFTER tag stripping, so `&lt;b&gt;` yields the
  *      LITERAL text `<b>` and never becomes markup (the standard's
  *      one-pass rule; also the injection-safety property). The decoded
  *      set: the named core (lt, gt, quot, apos, nbsp), then GENERAL
  *      numeric references `&#NNNN;`/`&#xHH;` (full Unicode range,
  *      UTF-8-exact; invalid codepoints — 0, >U+10FFFF, surrogates —
  *      stay literal), then amp LAST so double-encoded entities stay
  *      literal (`&amp;lt;` is the literal `&lt;`, `&amp;#65;` the
  *      literal `&#65;`).
  *   4. Blocks split on the inserted newlines; whitespace collapses
  *      within a block; empty blocks drop; surviving blocks number in
  *      document order.
  *
  * Scale shape (100 TB): one codegen projection per row — the entire
  * chain is regexp_replace/replace/split/transform built-ins with zero
  * exchange; block explosion is output-sized. The per-document work is
  * linear in the HTML length.
  */
object HtmlOps {

  /** The tag families that delimit BLOCKS (newline on open or close). */
  private val BlockTags =
    "p|div|br|h[1-6]|li|ul|ol|tr|td|th|table|blockquote|section|article|header|footer|pre|title"

  /** Raw HTML → newline-delimited text: the regex-chain core (stages 1–3
    * of the scaladoc contract). The output still carries raw whitespace;
    * `htmlBlocks` finishes segmentation.
    */
  private def extractRaw(html: Column): Column = {
    // script/style elide BEFORE comments: the legacy script-hiding idiom
    // (`<script><!-- … //--></script>`) plants a bare `<!--` inside
    // script text whose `-->` may lie OUTSIDE the element — a
    // comments-first pass would elide through the `</script>` tag and
    // swallow real document text. Script-first contains the comment
    // inside the elided element. (The converse pathology — a comment
    // holding an unclosed `<script>` open tag — is the rarer page shape;
    // the ordering choice is pinned by HtmlExtractSpec.)
    val c1 = regexp_replace(html, "(?is)<script\\b[^>]*>.*?</script[^>]*>", " ")
    val c2 = regexp_replace(c1, "(?is)<style\\b[^>]*>.*?</style[^>]*>", " ")
    val c3 = regexp_replace(c2, "(?s)<!--.*?-->", " ")
    val c4 = regexp_replace(c3, s"(?i)</?(?:$BlockTags)\\b[^>]*>", "\n")
    val c5 = regexp_replace(c4, "(?s)<[^>]*>", " ")
    decodeEntities(c5)
  }

  /** Entity decode — named, then GENERAL numeric references, then amp
    * LAST so double-encoded entities stay literal (`&amp;#65;` is the
    * literal `&#65;`, exactly like `&amp;lt;`). Shared by the text
    * chain and the metadata extractor (q150) — titles and attribute
    * values escape the same way body text does.
    */
  def decodeEntities(s: Column): Column = {
    val named = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#34;" -> "\"", "&#39;" -> "'", "&apos;" -> "'")
      .foldLeft(s) { case (acc, (ent, ch)) => replace(acc, lit(ent), lit(ch)) }
    replace(decodeNumericEntities(named), lit("&amp;"), lit("&"))
  }

  /** The two numeric-character-reference shapes of the HTML spec's safe
    * core: decimal `&#NNNN;` and hex `&#xHH;`.
    */
  private[graft] val NumEntityRe = "&#[0-9]{1,7};|&#[xX][0-9A-Fa-f]{1,6};"

  /** General numeric-character-reference decode — a fold of exact
    * replaces over the DISTINCT references present in the row (replace
    * is all-occurrences, so distinct suffices): parse the codepoint
    * (decimal, or a hex via base-16 `conv`), build its UTF-8 byte
    * sequence with shift/mask arithmetic, and `unhex → decode` it into
    * the character. An INVALID reference — codepoint 0, beyond
    * U+10FFFF, or a UTF-16 surrogate — stays literal text (never a
    * replacement by garbage; pinned by spec). All built-ins, no UDF;
    * the DuckDB oracle replays the identical fold with `list_reduce`.
    */
  private def decodeNumericEntities(s: Column): Column = {
    def hx(b: Column) = lpad(hex(b), 2, "0")
    aggregate(
      array_distinct(regexp_extract_all(s, lit(NumEntityRe), lit(0))),
      s,
      (acc, e) => {
        val isHex = lower(e.substr(lit(3), lit(1))) === "x"
        val cp = when(isHex,
          conv(e.substr(lit(4), length(e) - 4), 16, 10).cast("long"))
          .otherwise(e.substr(lit(3), length(e) - 3).cast("long"))
        val enc = when(cp <= 0x7f, hx(cp))
          .when(cp <= 0x7ff, concat(
            hx(shiftright(cp, 6) + 192),
            hx(cp.bitwiseAND(63) + 128)))
          .when(cp <= 0xffff, concat(
            hx(shiftright(cp, 12) + 224),
            hx(shiftright(cp, 6).bitwiseAND(63) + 128),
            hx(cp.bitwiseAND(63) + 128)))
          .otherwise(concat(
            hx(shiftright(cp, 18) + 240),
            hx(shiftright(cp, 12).bitwiseAND(63) + 128),
            hx(shiftright(cp, 6).bitwiseAND(63) + 128),
            hx(cp.bitwiseAND(63) + 128)))
        val valid = cp >= 1 && cp <= 0x10ffff &&
          !(cp >= 0xd800 && cp <= 0xdfff)
        replace(acc, e, when(valid, decode(unhex(enc), "UTF-8")).otherwise(e))
      })
  }

  /** Extracted text as an ARRAY of non-empty, whitespace-normalized
    * blocks in document order.
    */
  def htmlBlocks(html: Column): Column =
    filter(
      transform(split(extractRaw(html), "\n"),
        b => trim(regexp_replace(b, "\\s+", " "))),
      b => b =!= "")

  /** Extracted text as ONE newline-joined string — the `documents.text`
    * shape the rest of the pipeline consumes.
    */
  def htmlToText(html: Column): Column = array_join(htmlBlocks(html), "\n")

  /** Exploded (doc_id, block_idx, block) rows — the documents-shape
    * segmentation for per-block downstream processing.
    */
  def htmlBlockRows(docs: DataFrame, htmlCol: String = "html"): DataFrame =
    docs
      .select(col("doc_id"), posexplode(htmlBlocks(col(htmlCol))))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("block_idx"),
        col("col").as("block"))

  /** BLOCK-LEVEL MAIN-CONTENT selection — the jusText/Readability-style
    * structural boilerplate filter that runs right after extraction:
    * navigation chrome, headings, and footer fragments are SHORT and
    * stopword-poor, article prose is long and stopword-rich, so a block
    * survives iff `length ≥ minChars` AND its stopword fraction (basis
    * points over whitespace words, integer div) reaches `minStopBp`.
    * Defaults follow the q75 rule — tuned to this corpus' populated
    * ranges (whose synthetic prose is stopword-free, so the density
    * bound defaults to 0 and the length rule binds; production runs
    * pass jusText's thresholds, and the spec drives the density rule
    * explicitly).
    * This is the INTRA-document structural complement of q70's
    * CROSS-document frequency-based stripping — the two catch disjoint
    * boilerplate classes (a unique nav bar q70's df threshold can never
    * see; a corpus-wide license paragraph length heuristics keep).
    * Per-row codegen, no shuffle.
    */
  private val Stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "on")

  def mainContentBlocks(
      blocks: DataFrame,
      minChars: Int = 40,
      minStopBp: Long = 0L): DataFrame = {
    val stoplist = Stopwords.map(s => s"'$s'").mkString(", ")
    blocks
      .withColumn("n_chars", length(col("block")).cast("long"))
      // integer DIV — Column./ is double division, which would leak
      // floats into an oracle-hashed value
      .withColumn("stop_bp", expr(
        "CAST(size(filter(split(lower(block), ' '), " +
          s"t -> t IN ($stoplist))) * 10000 DIV " +
          "size(split(lower(block), ' ')) AS BIGINT)"))
      .withColumn("keep",
        col("n_chars") >= minChars && col("stop_bp") >= minStopBp)
  }

  /** q132: main-content selection over the q122 extraction — per
    * document the block count, surviving-block count, and the sha of
    * the kept content in block order; the oracle replays the whole
    * extract→classify chain (on the synthetic corpus the title/heading/
    * tail chrome drops and exactly the article body survives — pinned
    * by the hash, derived by the rule).
    */
  def q132MainContent(spark: SparkSession, dir: String): DataFrame =
    mainContentBlocks(
      htmlBlockRows(syntheticHtml(Tables.documents(spark, dir))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sha2(array_join(expr(
          "transform(array_sort(collect_list(CASE WHEN keep THEN " +
            "struct(block_idx, block) END)), x -> x.block)"), "\n"), 256)
          .as("main_sha"))
      .orderBy(col("doc_id"))

  /** Deterministic synthetic HTML over the documents table — the q69
    * constructed-corpus trick: the oracle rebuilds the identical markup
    * from (doc_id, text), so extraction is checked end-to-end against
    * planted script/style/comment content (which must vanish — the
    * script carries a decoy `<p>` that would surface as an extra block
    * if elision failed), literal entities (which must decode), and
    * block structure (which must segment).
    */
  private[graft] def syntheticHtml(docs: DataFrame): DataFrame = {
    val id = col("doc_id").cast("string")
    docs.select(col("doc_id"), concat(
      lit("<html><head><title>Doc "), id,
      lit("</title><style type=\"text/css\"> p { color: #fff; } </style>" +
        "<script> if (1 < 2 && x > 0) { y = \"<p>nope</p>\"; } </script>" +
        "</head><body><!-- comment "), id,
      lit(" --><h1 class=\"t\">Heading "), id,
      lit("</h1><p>"), col("text"),
      lit("</p><div id=\"tail\">Tail&nbsp;&amp;&nbsp;&lt;b&gt; &quot;q&quot; " +
        "&#39;v&#39; &apos;w&apos; of "), id,
      lit("</div><div>Plus&#233;e &#8212; &#x1F600; &#60;i&#62; " +
        "&#x3C;u&#x3E; bad &#xD800; &#0; &#1114112; &amp;#65; fin</div>" +
        "</body></html>")).as("html"))
  }

  /** q122: HTML → text extraction over the synthetic markup corpus —
    * per document the block count, extracted length, extracted-text
    * sha256, and the first block, every column oracle-replayed.
    */
  def q122HtmlExtract(spark: SparkSession, dir: String): DataFrame =
    // bind blocks/joined as named columns so the regex chain runs ONCE
    // per row, not once per output column
    syntheticHtml(Tables.documents(spark, dir))
      .select(col("doc_id"), htmlBlocks(col("html")).as("blocks"))
      .select(col("doc_id"), col("blocks"),
        array_join(col("blocks"), "\n").as("joined"))
      .select(col("doc_id"),
        size(col("blocks")).cast("long").as("n_blocks"),
        length(col("joined")).cast("long").as("n_chars"),
        sha2(col("joined"), 256).as("text_sha"),
        element_at(col("blocks"), 1).as("first_block"))
      .orderBy(col("doc_id"))
}
