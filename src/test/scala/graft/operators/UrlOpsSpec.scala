package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** URL canonicalization: rule-by-rule hand cases, case-sensitivity
  * boundaries (path/query preserved while scheme/host fold), the
  * declared `..` out-of-scope, idempotence, and q129's dedup counts.
  */
class UrlOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def canon(u: String): String = {
    import spark.implicits._
    Seq(u).toDF("u").select(UrlOps.urlCanonical(col("u"))).collect().head.getString(0)
  }

  test("scheme/host fold, default port strips, path and query stay case-sensitive") {
    assert(canon("HTTPS://Example.COM:443/Path/File?Q=Val") ==
      "https://example.com/Path/File?Q=Val")
    assert(canon("HTTP://A.B:80/x") == "http://a.b/x")
    // non-default ports survive; non-http(s) schemes keep their port
    assert(canon("https://a.b:8443/x") == "https://a.b:8443/x")
    assert(canon("ftp://A.B:80/x") == "ftp://a.b:80/x")
  }

  test("fragments drop; tracking params drop; remaining params sort; empty query drops ?") {
    assert(canon("https://a.b/p?z=1&a=2&utm_source=tw&fbclid=xyz#frag") ==
      "https://a.b/p?a=2&z=1")
    assert(canon("https://a.b/p?utm_campaign=x#only") == "https://a.b/p")
    assert(canon("https://a.b/p?") == "https://a.b/p")
  }

  test("slash runs and /./ segments collapse; empty path becomes /; .. is declared untouched") {
    assert(canon("https://a.b//x///y/./z") == "https://a.b/x/y/z")
    assert(canon("https://a.b/x/././y") == "https://a.b/x/y")
    assert(canon("https://a.b") == "https://a.b/")
    assert(canon("https://a.b/x/../y") == "https://a.b/x/../y") // out of scope, unchanged
  }

  test("canonicalization is idempotent") {
    for (u <- Seq(
      "HTTPS://Example.COM:443//x/./y?b=2&a=1&utm_source=s#f",
      "http://A.b:80/", "https://a.b/p?z=1&a=2")) {
      val once = canon(u)
      assert(canon(once) == once, s"not idempotent on $u -> $once")
    }
  }

  test("q129 on sf0.001: variants collide on the canonical key with exact counts") {
    import spark.implicits._
    val out = UrlOps.q129UrlCanonicalize(spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    assert(rows.nonEmpty)
    // every canonical url has the declared shape and the window count is
    // exactly the group size
    val byCanon = rows.groupBy(_.getString(2))
    byCanon.foreach { case (c, g) =>
      assert(c.matches("https://example\\.test/p/\\d+/\\?a=\\d&b=\\d"), c)
      g.foreach(r => assert(r.getLong(3) == g.length.toLong))
    }
    // collisions actually happen (doc_ids congruent mod lcm(50,7,3) share keys)
    assert(rows.exists(_.getLong(3) > 1), "fixture must produce canonical collisions")
  }
}
