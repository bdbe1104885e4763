package graft.diff

/** Myers O(ND) shortest-edit-script line diff (E. Myers, "An O(ND)
  * Difference Algorithm and Its Variations", Algorithmica 1986 — the greedy
  * forward algorithm of §4a).
  *
  * The delta chunking (greedy LCS path, deltas emitted in source-position
  * order, adjacent delete+insert fused into a replace) matches what the
  * reference obtains from the public java-diff-utils library
  * (reference `service/DiffService.java:192-222`, dep `build.gradle.kts:23`)
  * — the golden fixtures under `src/test/resources/diffservice` are the
  * acceptance spec for this equivalence.
  */
object Myers {

  sealed trait Delta extends Product with Serializable {
    def srcPos: Int
    def srcLines: Vector[String]
    def tgtPos: Int
    def tgtLines: Vector[String]
  }
  final case class InsertDelta(srcPos: Int, tgtPos: Int, tgtLines: Vector[String]) extends Delta {
    def srcLines: Vector[String] = Vector.empty
  }
  final case class DeleteDelta(srcPos: Int, srcLines: Vector[String], tgtPos: Int) extends Delta {
    def tgtLines: Vector[String] = Vector.empty
  }
  final case class ChangeDelta(srcPos: Int, srcLines: Vector[String], tgtPos: Int, tgtLines: Vector[String]) extends Delta

  /** A node on the D-path: position (i, j) reached, whether via a snake
    * (run of equal elements), linked to the previous node.
    */
  private final class PathNode(val i: Int, val j: Int, val snake: Boolean, val bootstrap: Boolean, prevNode: PathNode) {
    /** Previous node, skipping degenerate (zero-progress) diff nodes. */
    val prev: PathNode =
      if (snake) prevNode
      else if (prevNode == null) null
      else prevNode.previousSnake
    def previousSnake: PathNode =
      if (bootstrap) null
      else if (!snake && prev != null) prev.previousSnake
      else this
  }

  /** Compute the edit script turning `source` into `target`. Deltas are
    * returned in ascending source-position order; both-sides-nonempty
    * segments come back as a single ChangeDelta (replace), matching the
    * greedy path's fused treatment of adjacent delete+insert.
    */
  def diff(source: IndexedSeq[String], target: IndexedSeq[String]): List[Delta] =
    buildRevision(buildPath(source, target), source, target)

  /** Greedy forward D-path search over the edit graph. */
  private def buildPath(orig: IndexedSeq[String], rev: IndexedSeq[String]): PathNode = {
    val n = orig.length
    val m = rev.length
    val max = n + m + 1
    val size = 1 + 2 * max
    val middle = size / 2
    val diagonal = new Array[PathNode](size)
    diagonal(middle + 1) = new PathNode(0, -1, true, true, null)
    var d = 0
    while (d < max) {
      var k = -d
      while (k <= d) {
        val kmiddle = middle + k
        val kplus = kmiddle + 1
        val kminus = kmiddle - 1
        var prev: PathNode = null
        var i = 0
        if ((k == -d) || (k != d && diagonal(kminus).i < diagonal(kplus).i)) {
          i = diagonal(kplus).i // move down: take an insertion
          prev = diagonal(kplus)
        } else {
          i = diagonal(kminus).i + 1 // move right: take a deletion
          prev = diagonal(kminus)
        }
        diagonal(kminus) = null
        var j = i - k
        var node = new PathNode(i, j, false, false, prev)
        while (i < n && j < m && orig(i) == rev(j)) { i += 1; j += 1 }
        if (i != node.i) node = new PathNode(i, j, true, false, node)
        diagonal(kmiddle) = node
        if (i >= n && j >= m) return diagonal(kmiddle)
        k += 2
      }
      diagonal(middle + d - 1) = null
      d += 1
    }
    throw new IllegalStateException("could not find a diff path") // unreachable: d ranges to n+m
  }

  /** Walk the path back to the origin, emitting one delta per non-snake
    * segment; reversal restores ascending source order.
    */
  private def buildRevision(pathIn: PathNode, orig: IndexedSeq[String], rev: IndexedSeq[String]): List[Delta] = {
    var path = pathIn
    var deltas = List.empty[Delta]
    if (path.snake) path = path.prev
    while (path != null && path.prev != null && path.prev.j >= 0) {
      val i = path.i
      val j = path.j
      path = path.prev
      val ianchor = path.i
      val janchor = path.j
      val srcLines = orig.slice(ianchor, i).toVector
      val tgtLines = rev.slice(janchor, j).toVector
      val delta: Delta =
        if (srcLines.isEmpty && tgtLines.nonEmpty) InsertDelta(ianchor, janchor, tgtLines)
        else if (srcLines.nonEmpty && tgtLines.isEmpty) DeleteDelta(ianchor, srcLines, janchor)
        else ChangeDelta(ianchor, srcLines, janchor, tgtLines)
      deltas = delta :: deltas
      if (path.snake) path = path.prev
    }
    deltas
  }
}
