package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** robots.txt evaluation (RFC 9309) — the crawl front door's
  * politeness gate: before any WARC record is even fetched, a real
  * crawler filters its URL frontier through per-host robots rules.
  * This implements the Robots Exclusion Protocol's decision core:
  *
  *   - group selection: `User-agent` lines open groups (consecutive
  *     agent lines share one); the product token's EXACT groups apply
  *     when any exist, else the `*` groups — so a hostile or generous
  *     group for some other bot never leaks into our verdicts;
  *   - rule matching: `Allow`/`Disallow` path patterns are implicitly
  *     start-anchored, `*` matches any octet run, a trailing `$`
  *     anchors the end (the RFC's two metacharacters); empty-pattern
  *     rules are void per the classic semantics;
  *   - decision: the MOST SPECIFIC (longest-pattern) matching rule
  *     wins; on a length tie `Allow` wins (the Google rule the RFC
  *     adopted); no matching rule → allowed; comments (`#…`) strip.
  *
  * Shape: robots are per-HOST — a tiny dimension next to the URL
  * frontier — so evaluation is parse-once-per-host, BROADCAST join to
  * the URLs, then a per-row decide (typed map, no shuffle beyond the
  * output sort). At 100 TB the frontier streams through the same
  * broadcast.
  *
  * q141 plants per-host rule files from doc_id arithmetic covering
  * every semantic branch (a decoy foreign-agent group that disallows
  * everything, prefix rules, an Allow overriding a shorter Disallow, a
  * `*` wildcard rule, a `$`-anchored rule) and pins each URL's verdict
  * AND the winning pattern — a group-selection, matching, or
  * longest-match slip flips hash-visible columns.
  */
object RobotsOps {

  final case class RobotsRule(allow: Boolean, pattern: String)

  private final case class Group(
      agents: scala.collection.mutable.ArrayBuffer[String],
      rules: scala.collection.mutable.ArrayBuffer[RobotsRule],
      var delay: Option[Long])

  /** The group walk shared by `parseRobots` and `crawlDelay`:
    * consecutive `User-agent` lines share one group; `Crawl-delay`
    * (the de-facto politeness record most crawlers honor) binds to its
    * group like a rule; a non-integral or negative value is ignored
    * (lenient, like the rule parsers).
    */
  private def chosenGroups(text: String, agent: String): Seq[Group] = {
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    var current: Group = null
    var lastWasAgent = false
    text.split("\n").foreach { raw =>
      val line = {
        val h = raw.indexOf('#')
        (if (h >= 0) raw.substring(0, h) else raw).trim
      }
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (!lastWasAgent || current == null) {
              current = Group(
                scala.collection.mutable.ArrayBuffer.empty,
                scala.collection.mutable.ArrayBuffer.empty, None)
              groups += current
            }
            current.agents += value.toLowerCase
            lastWasAgent = true
          case "allow" | "disallow" =>
            lastWasAgent = false
            if (current != null && value.nonEmpty)
              current.rules += RobotsRule(key == "allow", value)
          case "crawl-delay" =>
            lastWasAgent = false
            if (current != null && current.delay.isEmpty)
              current.delay = value.toLongOption.filter(_ >= 0)
          case _ => lastWasAgent = false // sitemap, host, …
        }
      }
    }
    val mine = groups.filter(_.agents.contains(agent.toLowerCase))
    (if (mine.nonEmpty) mine else groups.filter(_.agents.contains("*"))).toSeq
  }

  /** Parse a robots.txt body into the rules applicable to `agent`. */
  def parseRobots(text: String, agent: String): Seq[RobotsRule] =
    chosenGroups(text, agent).flatMap(_.rules)

  /** The `Crawl-delay` (whole seconds) applicable to `agent`, from the
    * same group selection as `parseRobots` — the first delay among the
    * chosen groups wins; None when the host states none.
    */
  def crawlDelay(text: String, agent: String): Option[Long] =
    chosenGroups(text, agent).flatMap(_.delay).headOption

  /** `Sitemap:` directives (RFC 9309 §2.2.4 "other records" / the
    * sitemaps.org convention): GLOBAL lines, independent of any
    * user-agent group — this is how a crawler DISCOVERS a host's
    * sitemap tree rather than guessing `/sitemap.xml`.
    */
  def sitemapUrls(text: String): Seq[String] =
    text.split("\n").toSeq.flatMap { raw =>
      val h = raw.indexOf('#')
      val line = (if (h >= 0) raw.substring(0, h) else raw).trim
      val colon = line.indexOf(':')
      if (colon > 0 && line.substring(0, colon).trim
          .equalsIgnoreCase("sitemap")) {
        val v = line.substring(colon + 1).trim
        if (v.nonEmpty) Some(v) else None
      } else None
    }

  /** Pattern match per RFC 9309: start-anchored, `*` wildcard, `$` end
    * anchor; literal octets elsewhere.
    */
  private[graft] def matches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val pat = if (anchored) pattern.dropRight(1) else pattern
    val re = pat.split("\\*", -1).map(java.util.regex.Pattern.quote)
      .mkString("^", ".*", if (anchored) "$" else "")
    java.util.regex.Pattern.compile(re).matcher(path).find()
  }

  /** Longest-match decision: (allowed, winning pattern — '' when no
    * rule matched).
    */
  def decide(rules: Seq[RobotsRule], path: String): (Boolean, String) = {
    val hits = rules.filter(r => matches(r.pattern, path))
    if (hits.isEmpty) (true, "")
    else {
      val best = hits.maxBy(r => (r.pattern.length, r.allow))
      (best.allow, best.pattern)
    }
  }

  /** The planted per-host rule file (shared with the oracle's verdict
    * arithmetic): a decoy deny-all group for a FOREIGN agent, then our
    * group exercising prefix, override, wildcard, and anchor rules.
    */
  private[graft] def syntheticRobots(h: Long): String =
    s"""# synthetic robots for host $h
       |User-agent: otherbot
       |Disallow: /
       |
       |User-agent: graftbot
       |User-agent: auditbot
       |Disallow: /p/$h
       |Allow: /p/$h/ok
       |Disallow: /q/*/x
       |Allow: /r/only$$
       |Disallow: /r/
       |Crawl-delay: 5
       |""".stripMargin

  /** q141: the robots gate over an arithmetic URL frontier — per doc
    * the host, path, verdict, and WINNING rule pattern, every column
    * replayed by the oracle from the same doc_id arithmetic. The
    * frontier's six path shapes cover: prefix disallow, allow
    * overriding a shorter disallow, no-rule default, wildcard
    * disallow, `$`-anchored allow beating the `/r/` disallow, and the
    * anchored rule REFUSING a longer path (so `/r/` catches it).
    */
  def q141RobotsGate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    // per-host parsed rules (the tiny dimension), broadcast to the urls
    val hostRules = docs
      .select((col("doc_id") % 8).as("h")).distinct()
      .as[Long]
      .map(h => (h, parseRobots(syntheticRobots(h), "GraftBot")
        .map(r => (r.allow, r.pattern))))
      .toDF("h", "rules")
    val urls = docs.select(col("doc_id"), (col("doc_id") % 8).as("h"),
      expr(
        """CASE doc_id % 6
          |  WHEN 0 THEN concat('/p/', doc_id % 8, '/page')
          |  WHEN 1 THEN concat('/p/', doc_id % 8, '/ok/deep')
          |  WHEN 2 THEN concat('/free/', doc_id % 25)
          |  WHEN 3 THEN concat('/q/', doc_id % 9, '/x')
          |  WHEN 4 THEN '/r/only'
          |  ELSE '/r/only/sub'
          |END""".stripMargin).as("path"))
    urls.join(broadcast(hostRules), Seq("h"))
      .select(col("doc_id"), col("h"), col("path"), col("rules"))
      .as[(Long, Long, String, Seq[(Boolean, String)])]
      .map { case (id, h, path, rules) =>
        val (allowed, rule) =
          decide(rules.map { case (a, p) => RobotsRule(a, p) }, path)
        (id, s"h$h.example.test", path, allowed, rule)
      }
      .toDF("doc_id", "host", "path", "allowed", "rule")
      .orderBy(col("doc_id"))
  }
}
