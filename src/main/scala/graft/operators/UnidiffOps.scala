package graft.operators

import graft.Tables
import graft.diff.Myers
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unified-diff render + parse + PATCH APPLY — the code-dataset ingest
  * operator: commit datasets (the other big LLM training corpus beside
  * the crawl) ship as unified diffs, and a pipeline that can't apply a
  * patch can't reconstruct file states, count real added/removed
  * lines, or dedup commits by content. Composes the engine's own
  * Myers engine (`graft.diff.Myers`, SURVEY §2.3 D6) for hunk
  * generation — the render side is the same delta model the diff
  * service uses.
  *
  * Render rules (standard `diff -u`): `---`/`+++` file headers,
  * `@@ -a,b +c,d @@` hunks with 3 context lines, deltas closer than
  * 2×context merge into one hunk, 1-based ranges with the
  * zero-length-range position convention.
  *
  * Parse + apply rules: hunk headers locate OLD positions; context
  * (` `) lines must MATCH the old file at their position (a mismatch
  * dead-letters the patch — apply is verified, never best-effort);
  * `-` lines consume old, `+` lines emit new; the reconstruction is
  * returned and hashed.
  *
  * The q160 corpus derives an edit per document from its own words
  * (line `id % n` replaced, one line appended) so the oracle replays
  * added/removed counts, the MERGED hunk count (the 2×context rule as
  * arithmetic on the edit gap), and the sha of the RECONSTRUCTED new
  * file — which pins render and apply against each other and against
  * the arithmetic at once.
  *
  * Scale shape (100 TB): per-row Myers + render + apply via
  * `mapPartitions`, zero shuffle before the output sort.
  */
object UnidiffOps {

  private val Context = 3

  final case class PatchInfo(
      doc_id: Long, status: String, n_hunks: Int, n_added: Int,
      n_removed: Int, new_text: String)

  // --------------------------------------------------------------- render

  /** Old/new line sets from (doc_id, text): 8-word lines; line
    * `id % n` replaced, `ADDED <id>` appended (empty docs just gain
    * the added line).
    */
  private[graft] def oldLines(text: String): Vector[String] =
    text.split("[ \t\r\n]+").filter(_.nonEmpty).grouped(8)
      .map(_.mkString(" ")).toVector

  private[graft] def newLines(id: Long, old: Vector[String]): Vector[String] = {
    val edited =
      if (old.isEmpty) old
      else old.updated((id % old.length).toInt, "EDITED " + id)
    edited :+ ("ADDED " + id)
  }

  /** Unified render of the Myers deltas: context-3 hunks, deltas
    * closer than 2×context merged.
    */
  private[graft] def renderUnified(
      old: Vector[String], neu: Vector[String]): String = {
    val deltas = Myers.diff(old, neu).sortBy(_.srcPos)
    if (deltas.isEmpty) return "--- a\n+++ b\n"
    // group deltas whose gap (old-side) is within 2*context
    val groups = deltas.foldLeft(Vector.empty[Vector[Myers.Delta]]) { (gs, d) =>
      if (gs.nonEmpty && {
        val last = gs.last.last
        d.srcPos - (last.srcPos + last.srcLines.length) <= 2 * Context
      }) gs.init :+ (gs.last :+ d)
      else gs :+ Vector(d)
    }
    val sb = new StringBuilder("--- a\n+++ b\n")
    groups.foreach { g =>
      val srcFrom = math.max(0, g.head.srcPos - Context)
      val srcTo = math.min(old.length, g.last.srcPos + g.last.srcLines.length + Context)
      val tgtFrom = math.max(0, g.head.tgtPos - Context)
      val tgtTo = math.min(neu.length, g.last.tgtPos + g.last.tgtLines.length + Context)
      val srcLen = srcTo - srcFrom
      val tgtLen = tgtTo - tgtFrom
      // the unified convention: position is 1-based; a zero-length
      // range reports the line BEFORE the insertion point
      def pos(from: Int, len: Int) = if (len == 0) from else from + 1
      sb.append(s"@@ -${pos(srcFrom, srcLen)},$srcLen +${pos(tgtFrom, tgtLen)},$tgtLen @@\n")
      var s = srcFrom
      g.foreach { d =>
        while (s < d.srcPos) { sb.append(" ").append(old(s)).append("\n"); s += 1 }
        d.srcLines.foreach(l => sb.append("-").append(l).append("\n"))
        d.tgtLines.foreach(l => sb.append("+").append(l).append("\n"))
        s = d.srcPos + d.srcLines.length
      }
      while (s < srcTo) { sb.append(" ").append(old(s)).append("\n"); s += 1 }
    }
    sb.toString
  }

  // ---------------------------------------------------------- parse+apply

  private val HunkRe = "@@ -(\\d+),(\\d+) \\+(\\d+),(\\d+) @@.*".r

  /** Parse a unified diff and APPLY it to `old`; context and deletion
    * lines are verified against the old file — a mismatch is a typed
    * dead letter, never a silent mis-apply.
    */
  private[graft] def applyUnified(
      docId: Long, old: Vector[String], patch: String): PatchInfo = {
    def dead(status: String) = PatchInfo(docId, status, 0, 0, 0, "")
    val lines = patch.split("\n", -1).toVector
    var i = 0
    // skip file headers
    while (i < lines.length &&
      (lines(i).startsWith("---") || lines(i).startsWith("+++"))) i += 1
    val out = Vector.newBuilder[String]
    var oldPos = 0
    var hunks = 0
    var added = 0
    var removed = 0
    while (i < lines.length && lines(i).nonEmpty) {
      lines(i) match {
        case HunkRe(a, b, _, _) =>
          hunks += 1
          val srcFrom = if (b.toInt == 0) a.toInt else a.toInt - 1
          if (srcFrom < oldPos || srcFrom > old.length) return dead("bad-hunk-order")
          while (oldPos < srcFrom) { out += old(oldPos); oldPos += 1 }
          i += 1
          var consumed = 0
          while (i < lines.length && lines(i).nonEmpty &&
            !lines(i).startsWith("@@")) {
            val l = lines(i)
            l.charAt(0) match {
              case ' ' =>
                if (oldPos >= old.length || old(oldPos) != l.substring(1))
                  return dead("context-mismatch")
                out += old(oldPos); oldPos += 1; consumed += 1
              case '-' =>
                if (oldPos >= old.length || old(oldPos) != l.substring(1))
                  return dead("delete-mismatch")
                oldPos += 1; removed += 1; consumed += 1
              case '+' => out += l.substring(1); added += 1
              case _ => return dead("bad-line")
            }
            i += 1
          }
          val _ = consumed
        case "" => i += 1
        case _ => return dead("bad-header")
      }
    }
    while (oldPos < old.length) { out += old(oldPos); oldPos += 1 }
    PatchInfo(docId, "ok", hunks, added, removed, out.result().mkString("\n"))
  }

  // ----------------------------------------------------------------- q160

  /** q160: diff → render → parse → apply end to end; added/removed
    * counts, the merged hunk count (the 2×context rule as gap
    * arithmetic), and the reconstructed-file sha all oracle-replayed.
    */
  def q160UnidiffApply(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) =>
        val old = oldLines(t)
        applyUnified(id, old, renderUnified(old, newLines(id, old)))
      })
      .toDF()
      .select(col("doc_id"), col("status"),
        col("n_hunks").cast("long").as("n_hunks"),
        col("n_added").cast("long").as("n_added"),
        col("n_removed").cast("long").as("n_removed"),
        sha2(col("new_text"), 256).as("new_sha"))
      .orderBy(col("doc_id"))
  }
}
