package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Batch session operators: q16's value semantics are oracle-checked by
  * the driver; this spec pins q33's plan shape.
  */
class SessionOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("q33 sessionize shares one shuffle+sort between lag and the running sum") {
    val qe = SessionOps.q33Sessionize(spark, "/root/testdata/sf0.001").queryExecution
    // lag (default frame) and the running sum (rows-unbounded frame) have
    // different frames, so Catalyst plans two Window operators — but they
    // must ride ONE (user_id; ts_us, event_id) partition-sort (the other
    // Sort in the plan is the final output orderBy): a second window sort
    // would mean the two window specs diverged. Count real SortExec nodes
    // (not plan-string substrings, which cross-suite cached subtrees can
    // pollute).
    val windowSorts = graft.SparkTestSession.finalPlan(
        SessionOps.q33Sessionize(spark, "/root/testdata/sf0.001")).collect {
      case s: org.apache.spark.sql.execution.SortExec
        if s.sortOrder.map(_.child.toString).exists(_.contains("user_id")) &&
           s.sortOrder.map(_.child.toString).exists(_.contains("event_id")) => s
    }.length
    assert(windowSorts == 1,
      s"expected one (user_id; ts_us, event_id) window sort, found $windowSorts:\n${qe.executedPlan}")
  }

  test("q35 union+window as-of == naive inequality-join argmax on real data") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val spark2 = spark
    val ev = graft.Tables.events(spark2, "/root/testdata/sf0.001")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("c_event_id"), col("ts_us").as("c_ts_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_event_id"), col("ts_us").as("p_ts_us"))
    // the O(|p|*|c-per-user|) encoding the operator exists to avoid —
    // kept here as the semantic reference only
    val w = Window.partitionBy(col("p_event_id"))
      .orderBy(col("c_ts_us").desc, col("c_event_id").desc)
    val naive = purchases.join(clicks, Seq("user_id"))
      .filter(col("c_ts_us") <= col("p_ts_us"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("p_event_id"), col("user_id"), col("p_ts_us"),
        col("c_event_id"), col("c_ts_us"))
    val composed = SessionOps.q35AsofJoin(spark2, "/root/testdata/sf0.001")
    assert(composed.count() > 0)
    assert(composed.exceptAll(naive).isEmpty && naive.exceptAll(composed).isEmpty,
      "union+window as-of diverged from the inequality-join reference")
  }

  test("q35 as-of join plans with ZERO join operators (union + window, one shuffle)") {
    val qe = SessionOps.q35AsofJoin(spark, "/root/testdata/sf0.001").queryExecution
    // the operator's reason to exist: the naive inequality-join encoding
    // explodes to O(|purchases|*|clicks/user|) candidates; the union+
    // running-last composition must contain no join of any kind. Collect
    // real join nodes — a substring check can trip on cached subtrees.
    val joins = qe.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j }
    assert(joins.isEmpty, qe.sparkPlan.toString)
    assert(qe.executedPlan.toString.contains("Window"), qe.executedPlan.toString)
  }

  test("q110 session paths: invariants on sf0.001, repetition counted") {
    val sf = "/root/testdata/sf0.001"
    val out = SessionOps.q110SessionPaths(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.nonEmpty && out.length <= 20)
    // ranks dense from 1; counts non-increasing; ties broken by path DESC
    assert(out.map(_._1).toSeq == (1L to out.length).toSeq)
    out.sliding(2).foreach {
      case Array((_, pa, na), (_, pb, nb)) =>
        assert(na > nb || (na == nb && pa > pb), s"order broken: $pa/$na vs $pb/$nb")
      case _ => ()
    }
    // every path is a 3-step chain over the 5 real event types
    val types = Set("click", "view", "purchase", "signup", "error")
    out.foreach { case (_, p, _) =>
      val steps = p.split(">")
      assert(steps.length == 3 && steps.forall(types), p)
    }
    // the top-1 count cannot exceed the total triple budget (Σ per
    // session of max(len − 2, 0)) — repetition counted, never distinct
    val budget = SessionOps.q33Sessionize(spark, sf)
      .collect().map(r => math.max(r.getLong(2) - 2, 0L)).sum
    assert(budget > 0 && out.head._3 <= budget)
  }

  test("q111 association rules: identities hold on sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val out = SessionOps.q111AssociationRules(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.nonEmpty)
    // pair symmetry of the raw co-count: n_ab == n_ba
    val co = out.map(t => (t._1, t._2) -> t._3).toMap
    co.foreach { case ((a, b), n) => assert(co((b, a)) == n, s"$a/$b asymmetric") }
    // lift symmetry (same numerator and denominator both directions)
    val lift = out.map(t => (t._1, t._2) -> t._6).toMap
    lift.foreach { case ((a, b), l) => assert(lift((b, a)) == l) }
    // support <= confidence (n_baskets >= n_a) and confidence <= 1e6
    out.foreach { case (a, b, _, sup, conf, _) =>
      assert(sup <= conf && conf <= 1000000L, s"$a->$b sup=$sup conf=$conf")
    }
  }
}
