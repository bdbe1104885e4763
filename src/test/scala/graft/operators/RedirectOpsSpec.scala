package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Redirect resolution: chain collapse, self- and 2-cycles, dangling
  * Locations (unresolved, typed), the hop cap, and the q179 round
  * trip.
  */
class RedirectOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def edges(rows: (String, Int, String)*) = {
    import spark.implicits._
    rows.toDF("url", "status", "location")
  }

  private def resolved(rows: (String, Int, String)*): Map[String, (String, Long, Boolean, Boolean)] = {
    import spark.implicits._
    RedirectOps.resolve(edges(rows: _*))
      .select("url", "final_url", "n_hops", "is_loop", "unresolved")
      .as[(String, String, Long, Boolean, Boolean)]
      .collect().map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
  }

  test("chains collapse; a 2-cycle and a self-loop both flag typed") {
    val m = resolved(
      ("a", 301, "b"), ("b", 302, "c"), ("c", 200, null),
      ("x", 301, "y"), ("y", 301, "x"), // 2-cycle
      ("z", 301, "z")) // self-loop
    assert(m("a") == (("c", 2L, false, false)))
    assert(m("b") == (("c", 1L, false, false)))
    assert(m("c") == (("c", 0L, false, false)))
    assert(m("x")._3 && m("y")._3 && m("z")._3, "cycles must flag")
    assert(m("z")._1 == "")
  }

  test("a dangling Location is unresolved, never a wrong answer") {
    val m = resolved(("a", 301, "gone"), ("b", 200, null))
    assert(m("a")._4 === true)
    assert(!m("a")._3)
  }

  test("a chain past the hop cap reports unresolved") {
    val chain = (0 to RedirectOps.MaxHops + 1).map { i =>
      (s"u$i", if (i == RedirectOps.MaxHops + 1) 200 else 301,
        if (i == RedirectOps.MaxHops + 1) null else s"u${i + 1}")
    }
    val m = resolved(chain: _*)
    assert(m("u0")._4 === true, "past-cap chain must be typed unresolved")
    assert(m("u1")._4 === false, "a chain exactly at the cap resolves")
  }

  test("q179 on sf0.001: chains, loops, and flags match the arithmetic") {
    val rows = RedirectOps.q179RedirectResolve(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      if (id % 50 == 49) {
        assert(r.getBoolean(4), s"doc $id must loop")
        assert(r.getString(2) == "")
      } else {
        assert(!r.getBoolean(4) && !r.getBoolean(5))
        assert(r.getLong(3) == id % 5, s"doc $id hops")
        assert(r.getString(2).endsWith(s"/doc/${id - id % 5}"))
      }
    }
  }
}
