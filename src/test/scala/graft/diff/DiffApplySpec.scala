package graft.diff

import graft.diff.DiffModel._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets

/** Reconstruct-after property (the diff-replay semantics the reference
  * documents in `DiffServiceTest.java:134-239`): applying
  * `diff(before, after)` to `before` reproduces `after`, line-exact, for
  * arbitrary task maps — including task additions, removals, and edits.
  */
class DiffApplySpec extends AnyFunSuite {

  /** Run a ScalaCheck property under ScalaTest without the scalatestplus
    * bridge (not in the offline artifact cache).
    */
  private def check(prop: Prop, minSuccessful: Int = 200): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minSuccessful), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }

  private val word: Gen[String] = Gen.oneOf(
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel")

  private val lineGen: Gen[String] =
    Gen.chooseNum(1, 4).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  // plain-text content (never valid JSON) so canonicalization is the raw split
  private val contentGen: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, lineGen)).map(_.mkString("\n"))

  private val taskIds = Gen.someOf(Seq("t1", "t2", "t3", "t4", "__start__t5"))

  private def stateGen: Gen[Map[String, String]] =
    taskIds.flatMap { ids =>
      Gen.sequence[List[(String, String)], (String, String)](
        ids.map(id => contentGen.map(id -> _)).toList
      ).map(_.toMap)
    }

  private def toCheckpoints(m: Map[String, String]): Map[String, Seq[CheckpointData]] =
    m.map { case (task, content) =>
      task -> (Seq(CheckpointData(
        content.getBytes(StandardCharsets.UTF_8), 1000L, "th", "cp", task)): Seq[CheckpointData])
    }

  private def toLines(m: Map[String, String]): Map[String, Vector[String]] =
    m.map { case (k, v) => k -> v.split("\n").toVector }

  test("apply(before, diff(before, after)) == after for random task maps") {
    check(Prop.forAll(stateGen, stateGen) { (before: Map[String, String], after: Map[String, String]) =>
      val diff = DiffEngine.computeDiff(toCheckpoints(before), toCheckpoints(after), 1)
      val reconstructed = diff match {
        case Some(d) => DiffEngine.applyDiff(toLines(before), d)
        case None    => toLines(before)
      }
      val expected = toLines(after)
      if (reconstructed != expected)
        println(s"MISMATCH\nbefore=$before\nafter=$after\ndiff=$diff\ngot=$reconstructed")
      reconstructed == expected
    })
  }

  test("applyChanges handles multi-delta edits positionally") {
    val before = Vector("a", "b", "c", "d", "e")
    val after = Vector("a", "B", "c", "x", "d")
    val changes = DiffEngine.contentChanges(
      Seq(CheckpointData(before.mkString("\n").getBytes(StandardCharsets.UTF_8), 1L, "", "", "t")),
      Seq(CheckpointData(after.mkString("\n").getBytes(StandardCharsets.UTF_8), 2L, "", "", "t")))
    assert(DiffEngine.applyChanges(before, changes) == after)
  }
}
