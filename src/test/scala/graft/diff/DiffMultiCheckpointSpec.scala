package graft.diff

import graft.diff.DiffModel._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets

/** Multi-checkpoint-per-task diff semantics (reference wart W6: the
  * reference logs an error yet proceeds by diffing the timestamp-sorted
  * concatenation — `DiffService.parseTo` :254-259 — which is the defined
  * behavior here).
  */
class DiffMultiCheckpointSpec extends AnyFunSuite {

  private def cd(task: String, ns: Long, content: String): CheckpointData =
    CheckpointData(content.getBytes(StandardCharsets.UTF_8), ns, "t", s"c$ns", task)

  test("computeDiff stays total when a task has no checkpoints on either side") {
    // representable through the public API; the reference logs and continues
    val diff = DiffEngine.computeDiff(
      Map("t" -> Seq.empty[CheckpointData]), Map("t" -> Seq.empty[CheckpointData]), 1)
    assert(diff.isEmpty) // no content, no changes — filtered as an empty diff
  }

  test("a task's content is the ts-sorted concatenation of its checkpoints") {
    // out-of-order arrival: concat must follow ns order, not list order
    val before = Map("t" -> (Seq(cd("t", 2, "beta\n"), cd("t", 1, "alpha\n"))))
    val after = Map("t" -> (Seq(cd("t", 1, "alpha\n"), cd("t", 2, "beta\ngamma"))))
    val diff = DiffEngine.computeDiff(before, after, 1)
    assert(diff.isDefined)
    val changes = diff.get.diffData("t").changes
    // before = "alpha\nbeta\n" (3 lines w/ trailing), after = "alpha\nbeta\ngamma"
    // raw split: ["alpha","beta"] vs ["alpha","beta","gamma"] → one insert
    assert(changes.length == 1)
    changes.head.change match {
      case Content.Insert(DiffRange(start, size), lines) =>
        assert(start == 2 && size == 1 && lines == Vector("gamma"))
      case other => fail(s"expected insert, got $other")
    }
    // stamped with the max ns across both sides
    assert(changes.head.timestamp == 2L)
  }

  test("__start__ accumulation: concatenated JSON canonicalizes to the first document") {
    // Jackson's default readValue ignores trailing tokens (the reference
    // uses a plain ObjectMapper, so it behaves identically): the
    // concatenation "{...}{...}" canonicalizes to the FIRST document, so
    // appending a second __start__ checkpoint yields NO diff for JSON
    // payloads. Faithful-to-reference behavior, asserted here.
    val s1 = Map("__start__" -> (Seq(cd("__start__", 1, "{\"a\":1}"))))
    val s2 = Map("__start__" -> (Seq(cd("__start__", 1, "{\"a\":1}"), cd("__start__", 2, "{\"b\":2}"))))
    assert(DiffEngine.computeDiff(s1, s2, 5).isEmpty)
    // non-JSON payloads DO diff as a growing concatenation
    val p1 = Map("__start__" -> (Seq(cd("__start__", 1, "alpha\n"))))
    val p2 = Map("__start__" -> (Seq(cd("__start__", 1, "alpha\n"), cd("__start__", 2, "beta"))))
    val diff = DiffEngine.computeDiff(p1, p2, 5)
    assert(diff.isDefined && diff.get.sequenceNumber == 5)
    val changes = diff.get.diffData("__start__").changes
    assert(DiffEngine.applyChanges(Vector("alpha"), changes) == Vector("alpha", "beta"))
  }
}
