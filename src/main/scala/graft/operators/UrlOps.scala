package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL canonicalization + dedup — the crawl-pipeline operator that runs
  * before any fetch-level dedup: the same page arrives under countless
  * spellings (case-shifted scheme/host, default ports, fragments,
  * tracking params, shuffled query order, doubled slashes), and a
  * corpus keyed on raw URLs overcounts and refetches. The rule set is
  * the standard safe-normalization core (RFC 3986 §6 syntax-based
  * normalization plus tracking-param removal), each rule a
  * deterministic string rewrite in the Java/RE2 common dialect so a SQL
  * oracle replays the whole chain:
  *
  *   1. fragment drops (`#…` — never sent to the server);
  *   2. scheme and host lowercase (case-insensitive by spec; paths and
  *      queries stay case-SENSITIVE);
  *   3. default ports strip (`:443` for https, `:80` for http);
  *   4. empty path becomes `/`; runs of `/` collapse; `/./` segments
  *      collapse (dot-SEGMENT `..` resolution needs a stack and is
  *      declared out of scope — it cannot be expressed as a bounded
  *      rewrite chain and real canonicalizers treat it as unsafe
  *      across redirects anyway);
  *   5. tracking params (`utm_*`, `fbclid`, `gclid`) and empty params
  *      drop; the rest SORT (order never reaches the server);
  *      an emptied query drops its `?`.
  *
  * Scale shape: one codegen projection per row, no shuffle; the dedup
  * count is one window over the canonical key.
  */
object UrlOps {

  /** The canonicalization chain over a URL column. */
  def urlCanonical(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    val host = when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .otherwise(hostPort)
    val rawPath = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    val path = regexp_replace(
      regexp_replace(
        when(rawPath === "", lit("/")).otherwise(rawPath),
        "/{2,}", "/"),
      "(/\\.)+/", "/")
    val rawQuery = regexp_extract(noFrag, "\\?([^#]*)", 1)
    val params = array_join(
      array_sort(filter(split(rawQuery, "&"),
        p => p =!= "" && !p.rlike("^(utm_[A-Za-z0-9_]*|fbclid|gclid)="))),
      "&")
    concat(scheme, lit("://"), host, path,
      when(params === "", lit("")).otherwise(concat(lit("?"), params)))
  }

  /** Deterministic messy-URL corpus over `documents`: scheme/host case
    * shifts, a default port, doubled slashes, a `/./` segment, shuffled
    * query order, tracking params, and fragments — all varying by
    * doc_id, all collapsing to
    * `https://example.test/p/<id%25>/?a=<id%5>&b=<id%2>` (key period
    * lcm = 50), so documents collide on the canonical key and the dedup
    * count is non-trivial at every sf.
    */
  private[graft] def messyUrl(docId: Column): Column = {
    val scheme = when(docId % 2 === 0, lit("HTTPS")).otherwise(lit("https"))
    val host = when(docId % 3 === 0, lit("Example.TEST"))
      .when(docId % 3 === 1, lit("example.test:443"))
      .otherwise(lit("EXAMPLE.test"))
    val dot = when(docId % 5 === 0, lit("/./")).otherwise(lit("/"))
    val a = concat(lit("a="), (docId % 5).cast("string"))
    val b = concat(lit("b="), (docId % 2).cast("string"))
    val q = when(docId % 2 === 0,
      concat(b, lit("&utm_source=x&"), a))
      .otherwise(concat(a, lit("&"), b, lit("&utm_campaign=y")))
    val frag = when(docId % 4 === 0, concat(lit("#sec"), docId.cast("string")))
      .otherwise(lit(""))
    concat(scheme, lit("://"), host, lit("/p//"), (docId % 25).cast("string"),
      dot, lit("?"), q, frag)
  }

  /** q129: canonicalization + canonical-key dedup over the messy
    * corpus — per document the raw URL, its canonical form, and how
    * many corpus URLs share that canonical key; every rule replayed by
    * the oracle.
    */
  def q129UrlCanonicalize(spark: SparkSession, dir: String): DataFrame = {
    val urls = Tables.documents(spark, dir)
      .select(col("doc_id"), messyUrl(col("doc_id")).as("url"))
    urls
      .withColumn("canon_url", urlCanonical(col("url")))
      .withColumn("n_variants",
        count(lit(1)).over(Window.partitionBy(col("canon_url"))))
      .select(col("doc_id"), col("url"), col("canon_url"),
        col("n_variants").cast("long").as("n_variants"))
      .orderBy(col("doc_id"))
  }
}
