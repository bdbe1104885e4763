package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Integer PageRank: step-exact parity with a plain-Scala reference on a
  * hand graph, and shape checks on the purchase graph. Value-level oracle
  * parity is q99's DuckDB gate.
  */
class GraphOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def referenceRanks(
      edges: Seq[(String, String)], iterations: Int): Map[String, Long] = {
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = deg.keys.map(_ -> GraphOps.Scale).toMap
    for (_ <- 1 to iterations) {
      val contrib = edges.groupBy(_._2).view.mapValues {
        _.map { case (src, _) => r(src) / deg(src) }.sum
      }.toMap
      r = contrib.map { case (n, c) =>
        n -> (GraphOps.Scale * 15 / 100 + GraphOps.Damping * c / 100)
      }
    }
    r
  }

  test("ranks match the reference loop exactly on a hand graph") {
    import spark.implicits._
    // a ring with a chord: every node has out-edges, degrees differ
    val edges = Seq(
      "a" -> "b", "b" -> "c", "c" -> "a", "a" -> "c", "c" -> "d", "d" -> "a")
    val got = GraphOps.pageRank(edges.toDF("src", "dst"), iterations = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == referenceRanks(edges, 3))
  }

  test("high-degree hubs outrank leaves on a star graph") {
    import spark.implicits._
    // hub connected to 5 leaves, bidirectional (q99's edge shape)
    val pairs = (1 to 5).map(i => ("hub", s"leaf$i"))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val ranks = GraphOps.pageRank(edges, iterations = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert((1 to 5).forall(i => ranks("hub") > ranks(s"leaf$i")), ranks.toString)
    // leaves are symmetric: identical ranks
    assert((2 to 5).forall(i => ranks(s"leaf$i") == ranks("leaf1")))
  }

  test("q104 co-occurrence: exact Jaccard arithmetic and threshold on a hand corpus") {
    import spark.implicits._
    // suppliers A,B share customers 1,2,3 (3 shared); A,C share only 1
    val inter = Seq(
      (1L, "A"), (1L, "B"), (1L, "C"),
      (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "B"), (3L, "A") // duplicate interaction: distincted
    ).toDF("c", "s")
    val got = GraphOps.coOccurrence(inter, minShared = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(5)))
    // deg(A)=3, deg(B)=3, shared=3 -> union=3 -> jaccard = 1e6
    assert(got.toSeq == Seq(("A", "B", 3L, 1000000L)), got.toSeq.toString)
    // threshold 1 admits the weak pairs too, with floor-div Jaccard
    val loose = GraphOps.coOccurrence(inter, minShared = 1)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(5))).toMap
    // A,C: shared 1, deg 3+1 -> union 3 -> 333333
    assert(loose(("A", "C")) == 333333L && loose(("B", "C")) == 333333L)
  }

  test("q104 degree cap drops a promiscuous customer entirely") {
    import spark.implicits._
    // customer 9 interacts with everything (degree 4 > cap 3): its pairs
    // must not exist and must not inflate supplier degrees
    val inter = (Seq((9L, "A"), (9L, "B"), (9L, "C"), (9L, "D")) ++
      Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"), (3L, "A"), (3L, "B")))
      .toDF("c", "s")
    val got = GraphOps.coOccurrence(inter, minShared = 1, maxCustomerDegree = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // only customers 1-3 survive: A,B share 3, degrees 3 and 3
    assert(got.toSeq == Seq(("A", "B", 3L, 3L, 3L)), got.toSeq.toString)
  }

  test("q117 triangles: exact counts on hand graphs (K4, path, star)") {
    import spark.implicits._
    // K4 on 1-4: 4 triangles, each node in C(3,2)=3, cc = 1.0;
    // a pendant path node 5-6 and a star center 7 with leaves 8,9:
    // no triangles, cc 0
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L),
      (7L, 8L), (7L, 9L)).toDF("s_a", "s_b")
    val byId = GraphOps.triangleStats(edges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(byId(1L) == ((3L, 3L, 1000000L)))
    assert(byId(2L) == ((3L, 3L, 1000000L)))
    assert(byId(3L) == ((3L, 3L, 1000000L)))
    // node 4 also touches the pendant edge: deg 4, 3 triangles of C(4,2)=6
    assert(byId(4L) == ((4L, 3L, 500000L)))
    assert(byId(5L) == ((2L, 0L, 0L)) && byId(6L) == ((1L, 0L, 0L)))
    assert(byId(7L) == ((2L, 0L, 0L)) && byId(8L) == ((1L, 0L, 0L)))
  }

  test("q117 orientation counts each triangle exactly once vs brute force") {
    import spark.implicits._
    // deterministic random graph; reference = direct triple enumeration
    val rnd = new scala.util.Random(117)
    val pairs = (for {
      a <- 1L to 20L; b <- (a + 1) to 20L if rnd.nextDouble() < 0.3
    } yield (a, b)).toSeq
    val edges = pairs.toDF("s_a", "s_b")
    val eset = pairs.toSet
    def adj(a: Long, b: Long) = eset.contains((math.min(a, b), math.max(a, b)))
    val ref = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for (a <- 1L to 20L; b <- (a + 1) to 20L; c <- (b + 1) to 20L
         if adj(a, b) && adj(b, c) && adj(a, c)) {
      ref(a) += 1; ref(b) += 1; ref(c) += 1
    }
    val got = GraphOps.triangleStats(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    for ((s, n) <- got) assert(n == ref(s), s"node $s: engine $n vs brute ${ref(s)}")
    assert(ref.values.sum / 3 > 0, "fixture has no triangles")
  }

  test("q105 on sf0.001: percentile brackets hold per signup day") {
    val out = TimeSeriesOps.q105ConversionProfile(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, minS, maxS, med, p90) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(n > 0 && minS <= med && med <= p90 && p90 <= maxS, r.toString)
    }
  }

  test("q99 on sf0.001: all nodes ranked, both sides present, deterministic") {
    val sf = "/root/testdata/sf0.001"
    val out = GraphOps.q99PageRank(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.nonEmpty && out.forall(_._2 > 0))
    assert(out.exists(_._1.startsWith("c")) && out.exists(_._1.startsWith("s")))
    val again = GraphOps.q99PageRank(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == again.toSeq)
  }
}
