package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Enrichment sources (SURVEY §2.1 S5/S6 + §2.3 D12): read-once filesystem
  * report ingestion with archive semantics, a dependency-free git
  * repository scan, and the context left-join onto session output (which
  * the reference computed but never attached — wart W4, fixed here).
  *
  * Reference semantics: `subscriber/ctx/TestReportContextProvider.java:29-139`
  * (recursive per-session read, `<sessionId>:<fileName>` keys, destructive
  * read), `util/GitRepositoryScanner.java:43-118` (depth-limited `.git`
  * scan, branch + recent commits). The reference's cross-process advisory
  * lock is unnecessary here: one ingestion job owns the directory and
  * downstream keying is single-writer per session by shuffle (C2).
  */
object Enrichment {

  /** One ingested report file. */
  final case class ReportRow(session_id: String, report_key: String, content: String)

  /** S5: read every file under `reportDir/<sessionId>/` (recursive) as text,
    * keyed `<sessionId>:<fileName>`, then MOVE the session dirs to
    * `archiveDir` (read-once with an audit trail — safer than the
    * reference's hard delete, same effect for re-processing). The returned
    * DataFrame is fully materialized before archiving so laziness can never
    * re-scan moved files.
    *
    * Scale note: enumeration is driver-side NIO (report dirs are small,
    * session-scoped drops); the content ride-along is a plain DataFrame so
    * the downstream join distributes. For huge report volumes swap the
    * enumeration for `spark.read.format("binaryFile")` + `cleanSource`.
    */
  def ingestReports(spark: SparkSession, reportDir: String, archiveDir: String): DataFrame = {
    import spark.implicits._
    val root = Paths.get(reportDir)
    val rows: Seq[ReportRow] =
      if (!Files.isDirectory(root)) Seq.empty
      else {
        val sessionDirs = listDir(root).filter(Files.isDirectory(_))
        sessionDirs.flatMap { sessionDir =>
          val sessionId = sessionDir.getFileName.toString
          Files.walk(sessionDir).iterator().asScala
            .filter(Files.isRegularFile(_))
            .map { f =>
              ReportRow(sessionId, s"$sessionId:${f.getFileName}", Files.readString(f))
            }
            .toVector
        }
      }
    // archive = move each session dir away; the data is already on-heap
    if (Files.isDirectory(root)) {
      val archive = Paths.get(archiveDir)
      Files.createDirectories(archive)
      listDir(root).filter(Files.isDirectory(_)).foreach { sessionDir =>
        val target = archive.resolve(sessionDir.getFileName.toString)
        deleteRecursive(target)
        Files.move(sessionDir, target, StandardCopyOption.REPLACE_EXISTING)
      }
    }
    rows.toDF()
  }

  private def deleteRecursive(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).iterator().asScala.toVector.reverse.foreach(Files.deleteIfExists(_))
    }

  /** List a directory's entries eagerly, closing the underlying
    * DirectoryStream (a bare `Files.list` leaks the handle until GC).
    */
  private def listDir(p: Path): Vector[Path] = {
    val s = Files.list(p)
    try s.iterator().asScala.toVector finally s.close()
  }

  /** S5 at scale: the same read-once contract with the CONTENT never
    * touching the driver — a distributed `binaryFile` scan keyed by path
    * (executors read the files), materialized via `localCheckpoint` so the
    * archive move can't invalidate the lazy read, then the session dirs are
    * moved aside (driver touches directory entries only, O(sessions)).
    * Files sitting directly under `reportDir` (not inside a session dir)
    * are ignored, exactly as in the driver-side form — result is
    * row-identical to `ingestReports` (parity-tested).
    *
    * Reliability note: `localCheckpoint` blocks live on executors — if one
    * dies between materialization and downstream consumption the rows are
    * gone (lineage is truncated and the source was archived). Acceptable
    * for single-JVM/local runs; a cluster deployment should land the scan
    * in a scratch table (write+read) before archiving instead.
    */
  def ingestReportsDistributed(
      spark: SparkSession, reportDir: String, archiveDir: String): DataFrame = {
    import spark.implicits._
    val root = Paths.get(reportDir)
    val hasData = Files.isDirectory(root) && listDir(root).exists(Files.isDirectory(_))
    if (!hasData) return Seq.empty[ReportRow].toDF()
    val fsPath = new org.apache.hadoop.fs.Path(reportDir)
    val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prefix = fs.makeQualified(fsPath).toString + "/"
    val rows = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(reportDir)
      .select(expr(s"substring(path, ${prefix.length + 1})").as("rel"), col("content"))
      // session-scoped files only: a stray root-level file has no "/" and
      // would otherwise masquerade as its own session (and never archive)
      .filter(col("rel").contains("/"))
      .select(
        element_at(split(col("rel"), "/"), 1).as("session_id"),
        concat(element_at(split(col("rel"), "/"), 1), lit(":"),
          element_at(split(col("rel"), "/"), -1)).as("report_key"),
        col("content").cast("string").as("content"))
      .localCheckpoint(true)
    // archive AFTER materialization: move each session dir away
    val archive = Paths.get(archiveDir)
    Files.createDirectories(archive)
    listDir(root).filter(Files.isDirectory(_)).foreach { sessionDir =>
      val target = archive.resolve(sessionDir.getFileName.toString)
      deleteRecursive(target)
      Files.move(sessionDir, target, StandardCopyOption.REPLACE_EXISTING)
    }
    rows
  }

  /** One scanned git repository. */
  final case class GitRepoRow(
      repo_path: String, branch: String, head_commit: String, n_refs: Int)

  /** S6: depth-limited scan for `.git` directories with branch/HEAD read by
    * parsing `.git/HEAD` and `refs/heads` directly — no git binary, no JGit
    * (reference `GitRepositoryScanner.java:43-118`; its provider was
    * stubbed out, wart W5 — this is the working optional batch enrichment).
    */
  def scanGitRepos(spark: SparkSession, roots: Seq[String], maxDepth: Int = 3): DataFrame = {
    import spark.implicits._
    def findRepos(dir: Path, depth: Int): Vector[Path] =
      if (depth > maxDepth || !Files.isDirectory(dir)) Vector.empty
      else if (Files.isDirectory(dir.resolve(".git"))) Vector(dir)
      else
        Files.list(dir).iterator().asScala
          .filter(p => Files.isDirectory(p) && !p.getFileName.toString.startsWith("."))
          .toVector
          .flatMap(findRepos(_, depth + 1))

    val rows = roots.map(Paths.get(_)).flatMap(findRepos(_, 0)).distinct.map { repo =>
      val git = repo.resolve(".git")
      val head = Option(git.resolve("HEAD"))
        .filter(Files.isRegularFile(_)).map(p => Files.readString(p).trim)
      val (branch, commit) = head match {
        case Some(h) if h.startsWith("ref: ") =>
          val ref = h.stripPrefix("ref: ")
          val branchName = ref.stripPrefix("refs/heads/")
          val refFile = git.resolve(ref)
          val c =
            if (Files.isRegularFile(refFile)) Files.readString(refFile).trim
            else { // packed refs fallback
              val packed = git.resolve("packed-refs")
              if (Files.isRegularFile(packed))
                Files.readAllLines(packed).asScala
                  .find(_.endsWith(" " + ref)).map(_.split(" ")(0)).getOrElse("")
              else ""
            }
          (branchName, c)
        case Some(h) => ("DETACHED", h) // detached HEAD: the hash itself
        case None    => ("", "")
      }
      val headsDir = git.resolve("refs/heads")
      val nRefs =
        if (Files.isDirectory(headsDir))
          Files.walk(headsDir).iterator().asScala.count(Files.isRegularFile(_))
        else 0
      GitRepoRow(repo.toString, branch, commit, nRefs.toInt)
    }
    rows.toDF()
  }

  /** D12 context fan-in + attach (fixing W4): aggregate each session's
    * report items into an ordered ctx array and LEFT-join it onto the
    * session output, stamping every ctx entry with the session's next
    * sequence number (reference `ContextService.java:30-51` computed these
    * and dropped them; the entity's `ctx` field documents the intent).
    * Sessions without context keep an empty array.
    */
  def attachContext(sessions: DataFrame, reports: DataFrame): DataFrame = {
    val ctx = reports
      .groupBy(col("session_id"))
      .agg(sort_array(collect_list(
        struct(col("report_key"), col("content")))).as("ctx_items"))
    sessions
      .join(ctx, sessions("session_id") === ctx("session_id"), "left")
      .drop(ctx("session_id"))
      .withColumn("ctx",
        when(col("ctx_items").isNull, array().cast("array<struct<report_key:string,content:string,seq:int>>"))
          .otherwise(transform(col("ctx_items"),
            item => struct(
              item.getField("report_key").as("report_key"),
              item.getField("content").as("content"),
              (col("seq") + 1).cast("int").as("seq")))))
      .drop("ctx_items")
  }
}
