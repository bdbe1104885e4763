package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** robots.txt evaluation: group selection, rule matching metacharacters,
  * the longest-match / allow-tie decision rule, hostile inputs, and the
  * q141 end-to-end invariants.
  */
class RobotsOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import RobotsOps.{RobotsRule, decide, parseRobots}

  test("group selection: exact agent groups beat *; foreign groups never apply") {
    val txt =
      """User-agent: evilbot
        |Disallow: /
        |
        |User-agent: *
        |Disallow: /star
        |
        |User-agent: GraftBot
        |User-agent: auditbot
        |Disallow: /mine
        |""".stripMargin
    assert(parseRobots(txt, "graftbot") == Seq(RobotsRule(false, "/mine")))
    assert(parseRobots(txt, "AUDITBOT") == Seq(RobotsRule(false, "/mine")))
    // unknown agent falls back to the * group — never to evilbot's
    assert(parseRobots(txt, "somebot") == Seq(RobotsRule(false, "/star")))
    // multiple groups for the same agent merge
    val multi = txt + "\nUser-agent: graftbot\nAllow: /mine/ok\n"
    assert(parseRobots(multi, "graftbot") ==
      Seq(RobotsRule(false, "/mine"), RobotsRule(true, "/mine/ok")))
  }

  test("parsing: comments strip, empty Disallow is void, junk lines skip, never throws") {
    val txt =
      """User-agent: a  # our bot
        |Disallow:    # empty -> allow all
        |Disallow: /x # real rule
        |Sitemap: https://e.test/sm.xml
        |garbage without colon
        |: leading colon
        |""".stripMargin
    assert(parseRobots(txt, "a") == Seq(RobotsRule(false, "/x")))
    assert(parseRobots("", "a").isEmpty)
    assert(parseRobots("Disallow: /orphan", "a").isEmpty,
      "rules before any User-agent line have no group")
  }

  test("Sitemap: directives are global, case-insensitive, comment-stripped; " +
    "rule parsing ignores them") {
    val txt = "User-agent: *\nDisallow: /x\n" +
      "Sitemap: https://a.test/sm_root.xml\n" +
      "sitemap: https://a.test/other.xml # trailing comment\n" +
      "Sitemap:\n" // empty value drops
    assert(RobotsOps.sitemapUrls(txt) ==
      Seq("https://a.test/sm_root.xml", "https://a.test/other.xml"))
    // the rule parser is unaffected by the global records
    assert(RobotsOps.parseRobots(txt, "AnyBot") ==
      Seq(RobotsOps.RobotsRule(false, "/x")))
    assert(RobotsOps.sitemapUrls("no directives here") == Nil)
  }

  test("matching: start anchor, * wildcard, $ end anchor") {
    import RobotsOps.{matches => m}
    assert(m("/p", "/p/x") && m("/p", "/p"))
    assert(!m("/p", "/q/p"), "patterns are start-anchored")
    assert(m("/a/*/c", "/a/b/c") && m("/a/*/c", "/a/bb/c/d"))
    assert(!m("/a/*/c", "/a/b/d"))
    assert(m("/end$", "/end") && !m("/end$", "/end/more"))
    assert(m("/*.php$", "/x/y.php") && !m("/*.php$", "/x/y.php3"))
  }

  test("decision: longest pattern wins; allow wins a length tie; default allow") {
    val rules = Seq(
      RobotsRule(false, "/a"), RobotsRule(true, "/a/b"),
      RobotsRule(false, "/t1"), RobotsRule(true, "/t2"))
    assert(decide(rules, "/a/x") == ((false, "/a")))
    assert(decide(rules, "/a/b/c") == ((true, "/a/b")))
    assert(decide(rules, "/elsewhere") == ((true, "")))
    // exact length tie between allow and disallow -> allow
    val tie = Seq(RobotsRule(false, "/p/aa"), RobotsRule(true, "/p/ab"))
    assert(decide(tie :+ RobotsRule(false, "/p/a"), "/p/ab") == ((true, "/p/ab")))
  }

  test("q141 on sf0.001: verdicts follow the planted arithmetic; both verdict classes populated") {
    val rows = RobotsOps.q141RobotsGate(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val m = id % 6
      assert(r.getBoolean(3) == (m == 1 || m == 2 || m == 4),
        s"doc $id verdict ${r.getBoolean(3)}")
      if (m == 3) assert(r.getString(4) == "/q/*/x")
      if (m == 4) assert(r.getString(4) == "/r/only$")
    }
    assert(rows.count(_.getBoolean(3)) > 0 && rows.count(!_.getBoolean(3)) > 0)
  }
}
