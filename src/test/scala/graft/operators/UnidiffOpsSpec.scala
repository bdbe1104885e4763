package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Unified diff: render/apply round trips, hunk merging at the
  * 2×context rule, verified-context dead letters, empty-file edge,
  * hostile patches.
  */
class UnidiffOpsSpec extends AnyFunSuite {

  private def lines(n: Int, tag: String = "line"): Vector[String] =
    (0 until n).map(i => s"$tag $i content").toVector

  test("round trip: apply(render(old, new), old) == new, far edits make two hunks") {
    val old = lines(30)
    val neu = old.updated(2, "CHANGED").patch(25, Seq("INSERTED"), 0)
    val patch = UnidiffOps.renderUnified(old, neu)
    val out = UnidiffOps.applyUnified(1L, old, patch)
    assert(out.status == "ok")
    assert(out.new_text == neu.mkString("\n"))
    assert(out.n_hunks == 2) // gap 2..25 >> 2*context
    assert(out.n_added == 2 && out.n_removed == 1)
  }

  test("near edits merge into one hunk at the 2-context gap rule") {
    val old = lines(20)
    // change at 5, insert at 10: gap = 10 - 6 = 4 <= 6 → one hunk
    val neu = old.updated(5, "CHANGED").patch(10, Seq("INSERTED"), 0)
    val one = UnidiffOps.applyUnified(1L, old,
      UnidiffOps.renderUnified(old, neu))
    assert(one.n_hunks == 1)
    assert(one.new_text == neu.mkString("\n"))
    // change at 5, insert at 13: gap = 13 - 6 = 7 > 6 → two hunks
    val neu2 = old.updated(5, "CHANGED").patch(13, Seq("INSERTED"), 0)
    val two = UnidiffOps.applyUnified(1L, old,
      UnidiffOps.renderUnified(old, neu2))
    assert(two.n_hunks == 2)
    assert(two.new_text == neu2.mkString("\n"))
  }

  test("q160 corpus arithmetic: replace + append over real text") {
    val text = (1 to 100).map(i => s"w$i").mkString(" ") // 100 words → 13 lines
    val old = UnidiffOps.oldLines(text)
    assert(old.length == 13)
    for (id <- Seq(3L, 12L)) {
      val out = UnidiffOps.applyUnified(id, old,
        UnidiffOps.renderUnified(old, UnidiffOps.newLines(id, old)))
      assert(out.status == "ok")
      assert(out.n_added == 2 && out.n_removed == 1)
      val k = (id % 13).toInt
      assert(out.n_hunks == (if (13 - k - 1 <= 6) 1 else 2), s"id $id")
      assert(out.new_text == UnidiffOps.newLines(id, old).mkString("\n"))
    }
  }

  test("empty old file: pure-insert hunk with the 0,0 position convention") {
    val out = UnidiffOps.applyUnified(9L, Vector.empty,
      UnidiffOps.renderUnified(Vector.empty, UnidiffOps.newLines(9L, Vector.empty)))
    assert(out.status == "ok")
    assert(out.n_hunks == 1 && out.n_added == 1 && out.n_removed == 0)
    assert(out.new_text == "ADDED 9")
  }

  test("verified apply: context or deletion mismatch dead-letters, never mis-applies") {
    val old = lines(10)
    val patch = UnidiffOps.renderUnified(old, old.updated(4, "CHANGED") :+ "T")
    val drifted = old.updated(3, "drifted context")
    assert(UnidiffOps.applyUnified(1L, drifted, patch).status == "context-mismatch")
    val wrongDel = old.updated(4, "not what the patch deletes")
    assert(UnidiffOps.applyUnified(1L, wrongDel, patch).status == "delete-mismatch")
  }

  test("hostile patches never throw") {
    val old = lines(5)
    for (junk <- Seq("", "@@ garbage @@", "--- a\n+++ b\n@@ -1,2 +1,2 @@\n?bad",
        "--- a\n+++ b\n@@ -99,5 +1,5 @@\n line", "random text"))
      UnidiffOps.applyUnified(1L, old, junk)
  }
}
