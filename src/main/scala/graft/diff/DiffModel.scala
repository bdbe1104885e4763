package graft.diff

/** Data model of the diff engine (SURVEY.md §1.1, §2.3 D5–D10).
  *
  * Mirrors the reference's diff algebra (reference
  * `service/DiffService.java:143-252` and the `commit-diff-model` content
  * union it serializes): a tagged union of insert / remove / replace line
  * changes with `(start, size)` ranges. NOTE the serialized range field is
  * named `end` but carries a **size** — fixture
  * `diffservice/case1_addition/expected.json` has `{"start":0,"end":3}` for a
  * 3-line insert at 0. We keep that wire name for golden parity while naming
  * the field honestly in code.
  */
object DiffModel {

  /** `(start, size)` line range; serialized as `{"start": start, "end": size}`. */
  final case class DiffRange(start: Int, size: Int)

  sealed trait Content extends Product with Serializable
  object Content {
    final case class Insert(linesToAdd: DiffRange, lines: Vector[String]) extends Content
    final case class Remove(linesRemoved: DiffRange, lines: Vector[String]) extends Content
    final case class Replace(toRemove: Remove, toAddContent: Insert) extends Content
  }

  /** One change + the event-time it was observed (epoch millis — the
    * reference serializes `java.sql.Timestamp` as epoch millis).
    */
  final case class ContentChange(change: Content, timestamp: Long)

  final case class DiffItem(changes: Vector[ContentChange], taskId: String)

  /** One diff document per session update (reference
    * `entity/CheckpointDataDiff.java:19-28`).
    */
  final case class CheckpointDataDiff(sequenceNumber: Int, diffData: Map[String, DiffItem])

  /** A checkpoint blob observed for a task (reference
    * `dao/CheckpointDao.java:21-23`). `checkpointNs` is epoch millis.
    */
  final case class CheckpointData(
      checkpoint: Array[Byte],
      checkpointNs: Long,
      threadId: String,
      checkpointId: String,
      taskId: String)

  /** Serialize a diff to the reference's wire JSON (field names + `type`
    * discriminators `insert_content` / `remove_content` / `replace_content`
    * per the golden fixtures). Hand-built with Jackson's node API so the
    * shape is explicit and independent of any bean-mapping defaults.
    */
  def toJson(diff: CheckpointDataDiff): String = {
    import com.fasterxml.jackson.databind.ObjectMapper
    import com.fasterxml.jackson.databind.node.ObjectNode
    val mapper = new ObjectMapper()
    def rangeNode(parent: ObjectNode, name: String, r: DiffRange): Unit = {
      val n = parent.putObject(name)
      n.put("start", r.start)
      n.put("end", r.size) // wire name `end`, carries size (see class doc)
    }
    def contentNode(parent: ObjectNode, name: String, c: Content): Unit = {
      val n = parent.putObject(name)
      c match {
        case Content.Insert(range, lines) =>
          n.put("type", "insert_content")
          rangeNode(n, "linesToAdd", range)
          val arr = n.putArray("lines"); lines.foreach(arr.add)
        case Content.Remove(range, lines) =>
          n.put("type", "remove_content")
          rangeNode(n, "linesRemoved", range)
          val arr = n.putArray("lines"); lines.foreach(arr.add)
        case Content.Replace(rem, ins) =>
          n.put("type", "replace_content")
          contentNode(n, "toRemove", rem)
          contentNode(n, "toAddContent", ins)
      }
    }
    val root = mapper.createObjectNode()
    root.put("sequenceNumber", diff.sequenceNumber)
    val data = root.putObject("diffData")
    diff.diffData.foreach { case (task, item) =>
      val itemNode = data.putObject(task)
      val changes = itemNode.putArray("changes")
      item.changes.foreach { cc =>
        val ccNode = changes.addObject()
        contentNode(ccNode, "change", cc.change)
        ccNode.put("timestamp", cc.timestamp)
      }
      itemNode.put("taskId", item.taskId)
    }
    mapper.writeValueAsString(root)
  }
}
