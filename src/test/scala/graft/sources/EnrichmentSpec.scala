package graft.sources

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** Enrichment source tests mirroring the reference's 2-file fixture
  * (`TestReportContextProviderTest.java:43-61`: one.txt +
  * another/another/another.txt under a session dir; both ingested with
  * `<sessionId>:<fileName>` keys; source removed after the read).
  */
class EnrichmentSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def mkFixture(): (String, String) = {
    val base = Files.createTempDirectory("graft_reports_")
    val session = base.resolve("reports").resolve("test-registration")
    Files.createDirectories(session.resolve("another").resolve("another"))
    Files.writeString(session.resolve("one.txt"), "report one")
    Files.writeString(
      session.resolve("another").resolve("another").resolve("another.txt"), "report two")
    (base.resolve("reports").toString, base.resolve("archive").toString)
  }

  test("read-once ingest: 2 files keyed session:file, source archived") {
    val (reportDir, archiveDir) = mkFixture()
    val df = Enrichment.ingestReports(spark, reportDir, archiveDir)
    val rows = df.orderBy("report_key").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getString(1)).toSeq ==
      Seq("test-registration:another.txt", "test-registration:one.txt"))
    assert(rows.map(_.getString(0)).distinct.toSeq == Seq("test-registration"))
    assert(rows.map(_.getString(2)).toSet == Set("report one", "report two"))
    // destructive read: the session dir is gone from the source...
    assert(!Files.exists(Paths.get(reportDir, "test-registration")))
    // ...and a second ingest sees nothing
    assert(Enrichment.ingestReports(spark, reportDir, archiveDir).count() == 0)
    // the archive retains the files for audit
    assert(Files.exists(Paths.get(archiveDir, "test-registration", "one.txt")))
  }

  test("attachContext left-joins ctx with per-session sequence stamps (W4 fix)") {
    import spark.implicits._
    val sessions = Seq(("test-registration", 3), ("other-session", 1))
      .toDF("session_id", "seq")
    val (reportDir, archiveDir) = mkFixture()
    val reports = Enrichment.ingestReports(spark, reportDir, archiveDir)
    val out = Enrichment.attachContext(sessions, reports)
      .orderBy("session_id").collect()
    val bySession = out.map(r => r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](2)).toMap
    assert(bySession("other-session").isEmpty)
    val ctx = bySession("test-registration")
    assert(ctx.length == 2)
    assert(ctx.forall(_.getInt(2) == 4)) // seq 3 -> ctx stamped 4
    assert(ctx.map(_.getString(0)).toSet ==
      Set("test-registration:one.txt", "test-registration:another.txt"))
  }

  test("distributed ingest is row-identical to the driver-side ingest and read-once") {
    val (reportDirA, archiveDirA) = mkFixture()
    val (reportDirB, archiveDirB) = mkFixture()
    // a stray root-level file must be ignored by BOTH forms (it belongs to
    // no session and the archive move wouldn't remove it)
    Files.writeString(Paths.get(reportDirA, "stray.txt"), "not a report")
    Files.writeString(Paths.get(reportDirB, "stray.txt"), "not a report")
    val viaDriver = Enrichment.ingestReports(spark, reportDirA, archiveDirA)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val viaSpark = Enrichment.ingestReportsDistributed(spark, reportDirB, archiveDirB)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(viaSpark == viaDriver, s"driver=$viaDriver spark=$viaSpark")
    // read-once holds for the distributed form too, and the rows survive
    // the archive move (materialized before the source disappears)
    assert(!Files.exists(Paths.get(reportDirB, "test-registration")))
    assert(Enrichment.ingestReportsDistributed(spark, reportDirB, archiveDirB).count() == 0)
    assert(Files.exists(Paths.get(archiveDirB, "test-registration", "one.txt")))
  }

  test("git scan finds this repository and reads branch + HEAD") {
    val df = Enrichment.scanGitRepos(spark, Seq("/root/repo"), maxDepth = 0)
    val rows = df.collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getString(0) == "/root/repo")
    assert(r.getString(1) == "main")
    assert(r.getString(2).matches("[0-9a-f]{40}"), s"head=${r.getString(2)}")
    assert(r.getInt(3) >= 1)
  }
}
