package graft.streaming

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** S2: the IDE checkpoint feed as a DISTINCT wire shape (reference
  * `ide-schema.sql:1-16` — text ids, TEXT `checkpoint_ts`, binary blob,
  * `task_path`), mapped through `toEventRowsIde` and auto-detected by the
  * streaming source. Parity is asserted against the agents-shaped feed
  * carrying the same logical events.
  */
class IdeFeedSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  /** Re-shape the sf0.001 events into the reference's ide_checkpoints
    * schema: numeric ids become text, the event time becomes a TEXT
    * timestamp (the shape wart W3 revolves around), props become a bytea
    * blob, the task key moves to `task_path`.
    */
  private def ideShaped = Tables.events(spark, "/root/testdata/sf0.001").select(
    col("user_id").cast("string").as("thread_id"),
    concat(lit("prompt-"), col("event_id")).as("prompt_id"),
    col("user_id").cast("string").as("session_id"),
    col("ts").cast("string").as("checkpoint_ts"),
    col("event_id").cast("string").as("checkpoint_id"),
    encode(col("props"), "UTF-8").as("blob"),
    when(col("event_type") === "signup", lit("__start__"))
      .otherwise(col("event_type")).as("task_path"))

  test("toEventRowsIde == toEventRows on the same logical events (text-ts cast)") {
    val viaIde = CheckpointStream.toEventRowsIde(ideShaped).toDF()
    val viaEvents = CheckpointStream.toEventRows(
      Tables.events(spark, "/root/testdata/sf0.001")).toDF()
    assert(viaIde.count() > 0)
    assert(viaIde.exceptAll(viaEvents).isEmpty && viaEvents.exceptAll(viaIde).isEmpty,
      "IDE-shaped feed did not normalize to the same EventRows")
  }

  test("non-numeric ids fall back to stable 64-bit hash keys") {
    import spark.implicits._
    val df = Seq(("th-abc", "p", "s", "1970-01-01 00:00:00.001", "cp-9", "x".getBytes, "t"))
      .toDF("thread_id", "prompt_id", "session_id", "checkpoint_ts", "checkpoint_id", "blob", "task_path")
    val rows = CheckpointStream.toEventRowsIde(df).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.ts_us == 1000L && r.props == "x" && r.task_id == "t")
    // keys are the sign-masked xxhash64 of the text ids — deterministic
    // across runs AND non-negative, so the f"%020d" checkpointId zero-pad
    // keeps lexicographic order == numeric order (a negative hash would
    // format as '-000…n', inverting the tie-break among negatives)
    val expected = df.select(
      xxhash64(col("thread_id")).bitwiseAND(lit(Long.MaxValue)),
      xxhash64(col("checkpoint_id")).bitwiseAND(lit(Long.MaxValue)))
      .head
    assert(r.user_id == expected.getLong(0) && r.event_id == expected.getLong(1))
    assert(r.user_id >= 0 && r.event_id >= 0)
  }

  test("malformed IDE rows (bad text ts, null blob) are parked, not feed-poisoning") {
    import spark.implicits._
    val df = Seq(
      ("t1", "p", "s", "not-a-timestamp", "1", Option("x".getBytes), "task"),
      ("t2", "p", "s", "1970-01-01 00:00:00.002", "2", None: Option[Array[Byte]], "task"),
      ("t3", "p", "s", "1970-01-01 00:00:00.003", "3", Option("ok".getBytes), "task"))
      .toDF("thread_id", "prompt_id", "session_id", "checkpoint_ts", "checkpoint_id", "blob", "task_path")
    // without the guard the null ts_us / null props would crash the whole
    // query at deserialization (null into a primitive Long / NPE on blob)
    val rows = CheckpointStream.toEventRowsIde(df).collect()
    assert(rows.length == 1)
    assert(rows.head.event_id == 3L && rows.head.props == "ok")
  }

  test("identity-less rows (null thread/checkpoint id) are dropped, not merged onto a constant key") {
    import spark.implicits._
    // two UNRELATED null-thread_id rows would both hash to xxhash64(null)
    // and silently merge into one synthetic session; they must be dropped
    val df = Seq(
      (Option("t1"), "1970-01-01 00:00:00.001", Option("1")),
      (None: Option[String], "1970-01-01 00:00:00.002", Option("2")),
      (Option("t3"), "1970-01-01 00:00:00.003", None: Option[String]))
      .map { case (th, ts, cp) => (th, "p", "s", ts, cp, "x".getBytes, "task") }
      .toDF("thread_id", "prompt_id", "session_id", "checkpoint_ts", "checkpoint_id", "blob", "task_path")
    val ds = CheckpointStream.toEventRowsIde(df)
    assert(ds.collect().map(_.props).toSeq == Seq("x"))
    val m = ds.queryExecution.observedMetrics("graft_ide_feed")
    assert(m.getAs[Long]("rows_dropped") == 2L)
  }

  test("negative numeric wire ids are hashed, preserving the zero-pad order invariant") {
    import spark.implicits._
    val df = Seq(("-7", "p", "s", "1970-01-01 00:00:00.001", "-5", "x".getBytes, "t"))
      .toDF("thread_id", "prompt_id", "session_id", "checkpoint_ts", "checkpoint_id", "blob", "task_path")
    val r = CheckpointStream.toEventRowsIde(df).collect().head
    // "-5" parses as a long but a negative event_id would f"%020d"-format
    // as '-000…5', breaking lexicographic==numeric; it must take the same
    // hash branch as a non-numeric id, like the sign-mask doc promises
    val expected = df.select(
      xxhash64(col("thread_id")).bitwiseAND(lit(Long.MaxValue)),
      xxhash64(col("checkpoint_id")).bitwiseAND(lit(Long.MaxValue))).head
    assert(r.user_id == expected.getLong(0) && r.event_id == expected.getLong(1))
    assert(r.user_id >= 0 && r.event_id >= 0)
  }

  test("dropped malformed rows are surfaced via the graft_ide_feed observed metric") {
    import spark.implicits._
    val df = Seq(
      ("t1", "p", "s", "not-a-timestamp", "1", Option("x".getBytes), "task"),
      ("t2", "p", "s", "1970-01-01 00:00:00.002", "2", None: Option[Array[Byte]], "task"),
      ("t3", "p", "s", "1970-01-01 00:00:00.003", "3", Option("ok".getBytes), "task"))
      .toDF("thread_id", "prompt_id", "session_id", "checkpoint_ts", "checkpoint_id", "blob", "task_path")
    val ds = CheckpointStream.toEventRowsIde(df)
    assert(ds.collect().length == 1)
    val m = ds.queryExecution.observedMetrics("graft_ide_feed")
    assert(m.getAs[Long]("rows_seen") == 3L && m.getAs[Long]("rows_dropped") == 2L,
      s"feed-loss metric wrong: $m")
  }

  test("agents feed drops malformed rows (null id/ts/props) instead of dying, counted") {
    import spark.implicits._
    val df = Seq(
      (Option(1L), Option(1000L), Option(10L), Option("click"), Option(1.0), Option("""{"a":1}""")),
      (None: Option[Long], Option(1001L), Option(11L), Option("click"), Option(1.0), Option("x")),
      (Option(3L), Option(1002L), Option(12L), Option("click"), Option(1.0), None: Option[String]))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp"))
    // without the guard, the null event_id NPEs the primitive decoder and
    // the null props NPEs toCheckpoint — either kills a streaming query
    val ds = CheckpointStream.toEventRows(df)
    val rows = ds.collect()
    assert(rows.map(_.event_id).toSeq == Seq(1L))
    val m = ds.queryExecution.observedMetrics("graft_events_feed")
    assert(m.getAs[Long]("rows_seen") == 3L && m.getAs[Long]("rows_dropped") == 2L)
  }

  test("dead-letter query quarantines exactly the rows the feed drops, with reasons") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_dl_").toString
    Seq(
      ("t1", "p", "s", "not-a-timestamp", "1", Option("x".getBytes), Option("task")),
      ("t2", "p", "s", "1970-01-01 00:00:00.002", "2", None: Option[Array[Byte]], Option("task")),
      ("t3", "p", "s", "1970-01-01 00:00:00.003", "3", Option("ok".getBytes), Option("task")),
      ("t4", "p", "s", "1970-01-01 00:00:00.004", "4", Option("ok2".getBytes), None: Option[String]))
      .toDF("thread_id", "prompt_id", "session_id", "checkpoint_ts", "checkpoint_id", "blob", "task_path")
      .coalesce(1).write.parquet(s"$base/feed")
    val main = CheckpointStream.run(
      spark, s"$base/feed", s"$base/ckpt", s"$base/sink", maxFilesPerTrigger = 64,
      schemaHint = Some(CheckpointStream.ideSchema))
    val dl = CheckpointStream.runDeadLetter(
      spark, s"$base/feed", s"$base/ckpt_dl", s"$base/quarantine")
    main.awaitTermination(120000L)
    dl.awaitTermination(120000L)
    // the two queries PARTITION the feed: valid rows reach the sink...
    val sunk = spark.read.parquet(s"$base/sink").select("payload")
      .collect().map(_.getString(0)).toSet
    assert(sunk == Set("ok"))
    // ...and each dropped row is in quarantine, original wire columns
    // intact, tagged with why it was dropped
    val q = spark.read.parquet(s"$base/quarantine")
      .select("checkpoint_id", "reason")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(q == Map("1" -> "bad_ts", "2" -> "null_blob", "4" -> "null_task_path"))
  }

  test("agents dead-letter query quarantines exactly the rows the feed drops, with reasons") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_dl_agents_").toString
    // one malformed row per agents validity rule + one valid row
    Seq(
      (Option(1L), Option(1000L), Option(10L), Option("click"), Option(1.0), Option("""{"a":1}""")),
      (None: Option[Long], Option(1001L), Option(11L), Option("click"), Option(1.0), Option("x")),
      (Option(3L), None: Option[Long], Option(12L), Option("click"), Option(1.0), Option("y")),
      (Option(4L), Option(1003L), None: Option[Long], Option("click"), Option(1.0), Option("z")),
      (Option(5L), Option(1004L), Option(14L), None: Option[String], Option(1.0), Option("w")),
      (Option(6L), Option(1005L), Option(15L), Option("click"), Option(1.0), None: Option[String]))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", expr("timestamp_micros(ts)"))
      .coalesce(1).write.parquet(s"$base/feed")
    val main = CheckpointStream.run(
      spark, s"$base/feed", s"$base/ckpt", s"$base/sink", maxFilesPerTrigger = 64)
    val dl = CheckpointStream.runDeadLetter(
      spark, s"$base/feed", s"$base/ckpt_dl", s"$base/quarantine")
    main.awaitTermination(120000L)
    dl.awaitTermination(120000L)
    // the two queries PARTITION the feed: the valid row reaches the sink...
    val sunk = spark.read.parquet(s"$base/sink").select("payload")
      .collect().map(_.getString(0)).toSet
    assert(sunk == Set("""{"a":1}"""))
    // ...and every dropped row is quarantined under ITS rule's reason tag,
    // original wire columns intact
    val q = spark.read.parquet(s"$base/quarantine").select("event_id", "reason")
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) -> r.getString(1)).toMap
    assert(q == Map(-1L -> "null_event_id", 3L -> "bad_ts", 4L -> "null_user_id",
      5L -> "null_event_type", 6L -> "null_props"), q)
    // the counted loss equals the recoverable quarantine volume — the
    // drop is no longer silent-but-counted-only on the primary CDC feed
    val dropped = main.recentProgress.toSeq
      .flatMap(p => Option(p.observedMetrics.get("graft_events_feed")))
      .map(_.getAs[Long]("rows_dropped")).sum
    assert(dropped == 5L, s"metric counted $dropped drops")
    assert(spark.read.parquet(s"$base/quarantine").count() == 5L)
  }

  test("JSON-lines feed dead-letter: drop/quarantine parity, including a wire-broken line") {
    val base = Files.createTempDirectory("graft_dl_json_").toString
    // JSON is where wire-level malformation actually comes from: a valid
    // row, a field-level-null row, a bad-timestamp row, and a line that is
    // not JSON at all (permissive parse → all-null row)
    val lines = Seq(
      """{"event_id":1,"ts":"1970-01-01T00:00:00.001+00:00","user_id":10,"event_type":"click","value":1.0,"props":"ok"}""",
      """{"event_id":2,"ts":"1970-01-01T00:00:00.002+00:00","user_id":11,"event_type":"click","value":1.0}""",
      """{"event_id":3,"ts":"not-a-timestamp","user_id":12,"event_type":"click","value":1.0,"props":"y"}""",
      """this line is not json""")
    Files.createDirectories(java.nio.file.Paths.get(base, "feed"))
    Files.write(java.nio.file.Paths.get(base, "feed", "part-0.json"),
      String.join("\n", lines: _*).getBytes)
    val hint = Some(CheckpointStream.eventsSchema())
    val main = CheckpointStream.run(
      spark, s"$base/feed", s"$base/ckpt", s"$base/sink", maxFilesPerTrigger = 64,
      schemaHint = hint, sourceFormat = "json")
    val dl = CheckpointStream.runDeadLetter(
      spark, s"$base/feed", s"$base/ckpt_dl", s"$base/quarantine",
      schemaHint = hint, sourceFormat = "json")
    main.awaitTermination(120000L)
    dl.awaitTermination(120000L)
    // the two queries PARTITION the feed: the valid row reaches the sink...
    val sunk = spark.read.parquet(s"$base/sink").select("payload")
      .collect().map(_.getString(0)).toSet
    assert(sunk == Set("ok"))
    // ...and every dropped row is quarantined under its reason tags; the
    // non-JSON line surfaces as the all-null row (every null rule fires)
    val q = spark.read.parquet(s"$base/quarantine").select("event_id", "reason")
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) -> r.getString(1)).toMap
    assert(q(2L) == "null_props" && q(3L) == "bad_ts", q)
    assert(q(-1L).contains("null_user_id") && q(-1L).contains("null_props"), q)
    // counted loss == recoverable quarantine volume, on a JSON feed too
    val dropped = main.recentProgress.toSeq
      .flatMap(p => Option(p.observedMetrics.get("graft_events_feed")))
      .map(_.getAs[Long]("rows_dropped")).sum
    assert(dropped == 3L, s"metric counted $dropped drops")
    assert(spark.read.parquet(s"$base/quarantine").count() == 3L)
    // a JSON dead-letter without a schema hint must refuse loudly
    val ex = intercept[IllegalArgumentException] {
      CheckpointStream.runDeadLetter(spark, s"$base/feed", s"$base/ckpt_dl2",
        s"$base/quarantine2", sourceFormat = "json")
    }
    assert(ex.getMessage.contains("schemaHint"))
  }

  test("batch backfill accepts the IDE wire shape (E2 parity per feed shape)") {
    val viaIde = CheckpointStream.backfill(spark, ideShaped).toDF()
    val viaEvents = CheckpointStream.backfill(
      spark, Tables.events(spark, "/root/testdata/sf0.001")).toDF()
    assert(viaIde.count() > 0)
    assert(viaIde.exceptAll(viaEvents).isEmpty && viaEvents.exceptAll(viaIde).isEmpty)
  }

  test("streaming auto-detects the IDE wire shape; sink matches the agents-feed backfill") {
    val base = Files.createTempDirectory("graft_ide_").toString
    // one file/batch: arrival order must respect event time (the CDC feed's
    // property); multi-batch cadence is covered by StreamingParitySpec
    ideShaped.coalesce(1).write.parquet(s"$base/feed")
    val q = CheckpointStream.run(
      spark, s"$base/feed", s"$base/ckpt", s"$base/sink", maxFilesPerTrigger = 64)
    q.awaitTermination(120000L)
    assert(!q.isActive)
    val streamed = spark.read.parquet(s"$base/sink")
      .select("user_id", "task_id", "event_id", "ts_us", "payload", "seq")
    val batch = CheckpointStream.backfill(
      spark, Tables.events(spark, "/root/testdata/sf0.001")).toDF()
      .select("user_id", "task_id", "event_id", "ts_us", "payload", "seq")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "IDE-shaped streaming sink != agents-feed batch backfill")
    // the feed-loss metric must surface on the STREAMING progress path too
    // (the per-micro-batch observability contract, not just batch plans)
    val observed = q.recentProgress.flatMap(p =>
      Option(p.observedMetrics.get("graft_ide_feed")))
    assert(observed.nonEmpty, "graft_ide_feed observed metric missing from progress")
    assert(observed.map(_.getAs[Long]("rows_dropped")).sum == 0L)
    assert(observed.map(_.getAs[Long]("rows_seen")).sum ==
      Tables.events(spark, "/root/testdata/sf0.001").count())
  }
}
