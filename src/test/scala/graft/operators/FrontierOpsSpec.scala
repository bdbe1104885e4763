package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Frontier scheduling: robots verdicts through the real evaluator,
  * per-host ranking with the full tie-break chain, politeness waves,
  * freshness lag, and the audit rows for disallowed URLs.
  */
class FrontierOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private lazy val out =
    FrontierOps.q154FrontierSchedule(spark, "/root/testdata/sf0.001").cache()

  test("robots verdicts: last-digit rules bind, odd hosts stricter") {
    val rows = out.select("doc_id", "host", "allowed", "rule").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val h = id % 8
      val expect = !(id % 10 == 3 || (h % 2 == 1 && id % 10 == 7))
      assert(r.getBoolean(2) == expect, s"doc $id")
      if (id % 10 == 3) assert(r.getString(3) == "/doc/*3$")
      else if (h % 2 == 1 && id % 10 == 7) assert(r.getString(3) == "/doc/*7$")
      else assert(r.getString(3) == "/doc/")
    }
  }

  test("ranking: within a host, allowed ranks are dense from 1 and honor priority") {
    val perHost = out.filter(col("allowed"))
      .select("host", "crawl_rank", "priority_tenths", "lastmod_day", "doc_id")
      .collect().groupBy(_.getString(0))
    perHost.foreach { case (_, rs) =>
      val ranks = rs.map(_.getLong(1)).sorted
      assert(ranks.toSeq == (1L to ranks.length).toSeq)
      val inOrder = rs.sortBy(_.getLong(1))
      inOrder.sliding(2).foreach {
        case Array(a, b) =>
          val ka = (-a.getLong(2), -a.getLong(3), a.getLong(4))
          val kb = (-b.getLong(2), -b.getLong(3), b.getLong(4))
          assert(Ordering[(Long, Long, Long)].lteq(ka, kb))
        case _ => ()
      }
    }
  }

  test("politeness waves: wave = (rank-1)/50 + 1; disallowed rows carry -1") {
    out.collect().foreach { r =>
      val rank = r.getAs[Long]("crawl_rank")
      val wave = r.getAs[Long]("fetch_wave")
      if (r.getAs[Boolean]("allowed")) assert(wave == (rank - 1) / 50 + 1)
      else { assert(rank == -1L); assert(wave == -1L) }
    }
  }

  test("freshness lag: zero for the host's newest URL, never negative") {
    val byHost = out.select("host", "fresh_lag").collect().groupBy(_.getString(0))
    byHost.foreach { case (_, rs) =>
      val lags = rs.map(_.getLong(1))
      assert(lags.min == 0L)
      assert(lags.forall(_ >= 0L))
    }
  }

  test("the foreign-agent deny-all decoy never leaks into GraftBot's rules") {
    val rules = RobotsOps.parseRobots(FrontierOps.schedulerRobots(2L), "GraftBot")
    assert(rules.nonEmpty)
    assert(!rules.exists(r => !r.allow && r.pattern == "/"))
    // and OtherBot gets its own group, not ours
    val other = RobotsOps.parseRobots(FrontierOps.schedulerRobots(2L), "OtherBot")
    assert(other.exists(r => !r.allow && r.pattern == "/"))
  }
}
