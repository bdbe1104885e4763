package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Batch session operators: q16's value semantics are oracle-checked by
  * the driver; this spec pins q33's plan shape.
  */
class SessionOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("q33 sessionize shares one shuffle+sort between lag and the running sum") {
    val plan = SessionOps.q33Sessionize(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    // lag (default frame) and the running sum (rows-unbounded frame) have
    // different frames, so Catalyst plans two Window operators — but they
    // must ride ONE (user_id; ts_us, event_id) partition-sort (the other
    // Sort in the plan is the final output orderBy): a second window sort
    // would mean the two window specs diverged
    val windowSorts = "Sort \\[user_id[^\\]]*event_id".r.findAllIn(plan).length
    assert(windowSorts == 1,
      s"expected one (user_id; ts_us, event_id) window sort, found $windowSorts:\n$plan")
  }

  test("q35 as-of join plans with ZERO join operators (union + window, one shuffle)") {
    val plan = SessionOps.q35AsofJoin(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    // the operator's reason to exist: the naive inequality-join encoding
    // explodes to O(|purchases|*|clicks/user|) candidates; the union+
    // running-last composition must contain no join of any kind
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("Window"), plan)
  }
}
