package graft.state

import graft.diff.DiffModel.CheckpointData
import graft.state.SessionMerge._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets

/** Property tests for the three merge branches (D2), the late-data guard
  * (D3), and sequence numbering (D11) — semantics from reference
  * `DataStreamService.java:72-93` and `CheckpointDao.java:33-56`.
  */
class SessionMergeSpec extends AnyFunSuite {

  private def check(prop: Prop, min: Int = 200): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(min), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }

  private def cd(task: String, ns: Long, content: String = "x"): CheckpointData =
    CheckpointData(content.getBytes(StandardCharsets.UTF_8), ns, "th", s"cp$ns", task)

  test("insert branch: absent key is inserted") {
    val m = mergeOne(Map.empty, cd("t1", 1))
    assert(m("t1").map(_.checkpointNs) == Vector(1L))
  }

  test("replace branch: non-start key keeps only the incoming checkpoint") {
    check(Prop.forAll(Gen.listOf(Gen.chooseNum(0L, 50L))) { nss: List[Long] =>
      val merged = nss.foldLeft(Map.empty[String, Vector[CheckpointData]]) {
        (acc, ns) => mergeOne(acc, cd("task", ns))
      }
      nss.isEmpty || merged("task").map(_.checkpointNs) == Vector(nss.last)
    })
  }

  test("__start__ branch: append, deduped by equal event-time, order kept") {
    check(Prop.forAll(Gen.listOf(Gen.chooseNum(0L, 10L))) { nss: List[Long] =>
      val merged = nss.foldLeft(Map.empty[String, Vector[CheckpointData]]) {
        (acc, ns) => mergeOne(acc, cd("__start__", ns))
      }
      val got = merged.getOrElse("__start__", Vector.empty).map(_.checkpointNs)
      got == nss.distinct.map(identity) // first occurrence of each ts, in arrival order
    })
  }

  test("skip-stale: strictly-newer stored checkpoint rejects the event") {
    assert(skipStale(Vector(cd("t", 10)), 5))
    assert(!skipStale(Vector(cd("t", 10)), 10)) // equal is not stale
    assert(!skipStale(Vector(cd("t", 10)), 15))
    assert(!skipStale(Vector.empty, 5))
    // blank stored blob never blocks (reference CheckpointDao.java:47-50)
    assert(!skipStale(Vector(cd("t", 10, "")), 5))
  }

  test("update drops stale events and leaves state/diff unchanged") {
    val (s1, d1) = update(SessionState.empty("s"), Seq(cd("t", 10, "new")))
    assert(d1.nonEmpty && s1.sequenceNumber == 1)
    val (s2, d2) = update(s1, Seq(cd("t", 5, "old")))
    assert(d2.isEmpty && s2.content == s1.content && s2.sequenceNumber == 1)
  }

  test("sequence number advances only on updates that produce a diff") {
    val e1 = cd("t", 1, "a")
    val (s1, d1) = update(SessionState.empty("s"), Seq(e1))
    assert(d1.exists(_.sequenceNumber == 1) && s1.sequenceNumber == 1)
    // same content again: no diff, no advance
    val (s2, d2) = update(s1, Seq(cd("t", 1, "a")))
    assert(d2.isEmpty && s2.sequenceNumber == 1)
    val (s3, d3) = update(s2, Seq(cd("t", 2, "b")))
    assert(d3.exists(_.sequenceNumber == 2) && s3.sequenceNumber == 2)
  }

  test("argmax: one incoming checkpoint per task, max ts wins, id tie-break") {
    val picked = latestPerTask(Seq(cd("t", 1), cd("t", 3), cd("t", 2), cd("u", 9)))
    assert(picked("t").checkpointNs == 3 && picked("u").checkpointNs == 9)
    val tie = latestPerTask(Seq(
      cd("t", 5).copy(checkpointId = "a"), cd("t", 5).copy(checkpointId = "b")))
    assert(tie("t").checkpointId == "b")
  }

  test("mergeOnly: content evolution identical to the diff-emitting update") {
    check(Prop.forAll(Gen.listOf(
      for {
        task <- Gen.oneOf("t1", "t2", "__start__")
        ns <- Gen.chooseNum(0L, 20L)
        content <- Gen.oneOf("a", "b", "c", "") // blank exercises skip-stale's blank guard
      } yield cd(task, ns, content))) { events: List[CheckpointData] =>
      val ordered = events.sortBy(e => (e.checkpointNs, e.checkpointId))
      val viaUpdate = ordered.foldLeft(SessionState.empty("s")) {
        (st, e) => update(st, Seq(e))._1
      }
      val viaMergeOnly = ordered.foldLeft(SessionState.empty("s")) {
        (st, e) => mergeOnly(st, Seq(e))
      }
      viaMergeOnly.content == viaUpdate.content
    })
  }

  test("replay: full-history fold equals incremental updates") {
    check(Prop.forAll(Gen.listOf(
      for {
        task <- Gen.oneOf("t1", "t2", "__start__")
        ns <- Gen.chooseNum(0L, 20L)
        content <- Gen.oneOf("a", "b", "c")
      } yield cd(task, ns, content))) { events: List[CheckpointData] =>
      val (viaReplay, diffs) = replay("s", events)
      val ordered = events.sortBy(e => (e.checkpointNs, e.checkpointId))
      val viaSteps = ordered.foldLeft(SessionState.empty("s")) {
        (st, e) => update(st, Seq(e))._1
      }
      viaReplay == viaSteps &&
        diffs.map(_.sequenceNumber) == (1 to diffs.length).toVector
    })
  }
}
