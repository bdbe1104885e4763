package graft.streaming

import graft.operators.{FeedOps, RobotsOps, SitemapOps}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** The streaming FRONTIER lane: q154's fetch scheduler run as a
  * discovery stream — URLs arrive in micro-batches and leave as a
  * politeness-bucketed, robots-gated, freshness-scored fetch schedule,
  * with PER-HOST STATE carrying the crawl ranks across batches.
  *
  * The crawler CONFIG is a standing dimension (the lmModel/evalSet
  * discipline — robots and sitemaps refresh on config cadence, not per
  * URL) loaded ONCE from `configDir` and parsed by the REAL parsers,
  * never reimplementations:
  *   - `robots_h<h>.txt`      → `RobotsOps.parseRobots` (q141)
  *   - `sitemap_h<h>_<name>`  → `SitemapOps.parseSitemapHost` (q145;
  *     the blob map per host, index + gzip children included) — the
  *     per-URL lastmod/priority attributes
  *   - `feed_h<h>.xml`        → `FeedOps.parseFeed` (q149) — folded to
  *     the per-host publication high-water mark
  *
  * Per micro-batch: discovered doc_ids join the sitemap attributes
  * (broadcast here; bucketed-by-host at crawl scale), the robots
  * evaluator gates each path, allowed URLs rank per host by
  * (priority DESC, lastmod DESC, doc_id) OFFSET by the host's running
  * counter from `stateDir`, and bucket into fetch waves; disallowed
  * rows keep rank −1 with the winning pattern (audit, never silent).
  * URLs the sitemaps don't know dead-letter to `rejectsDir` tagged
  * `unknown_url`.
  *
  * ONLINE SEMANTICS, stated precisely: ranks are assigned in ARRIVAL
  * order batch-over-batch (the StreamCurate greedy-online form) — the
  * drained schedule equals batch q154 exactly when each host's URLs
  * arrive in its batch rank order (the spec feeds rank-banded chunks
  * to pin that contract).
  *
  * Replay: per-host counters are KEYED BY BATCH in `stateDir`
  * (`batch_id=B` holds the counters AFTER batch B); a replayed batch
  * re-reads its predecessor's generation and recomputes identical
  * rows, and the schedule append is first-write-wins (`appendDiffs`).
  */
object StreamFrontier {

  /** Parsed standing config: per-host robots rules, per-URL sitemap
    * attributes, per-host feed high-water mark.
    */
  final case class FrontierConfig(
      rules: Map[Long, Seq[(Boolean, String)]],
      urlAttrs: Seq[(Long, Long, String, Long, Long)], // (doc_id, h, path, lastmod, prio)
      hostMaxPub: Map[Long, Long])

  /** Load + parse `configDir` with the real q141/q145/q149 parsers. */
  def loadConfig(configDir: String): FrontierConfig = {
    val dir = new java.io.File(configDir)
    val files = Option(dir.listFiles()).getOrElse(Array.empty).toSeq
    def hostOf(name: String, prefix: String): Option[Long] =
      s"${prefix}_h(\\d+)".r.findFirstMatchIn(name).map(_.group(1).toLong)
    val robotsTexts = files.filter(_.getName.startsWith("robots_h")).map { f =>
      val h = hostOf(f.getName, "robots").get
      h -> new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    }.toMap
    val rules = robotsTexts.map { case (h, text) =>
      h -> RobotsOps.parseRobots(text, "GraftBot").map(r => (r.allow, r.pattern))
    }
    val sitemapHosts = files.filter(_.getName.startsWith("sitemap_h"))
      .groupBy(f => hostOf(f.getName, "sitemap").get)
    val urlAttrs = sitemapHosts.toSeq.flatMap { case (h, fs) =>
      val blobs = fs.map { f =>
        // blob name = everything after `sitemap_h<h>_`
        val name = f.getName.replaceFirst("sitemap_h\\d+_", "")
        name -> java.nio.file.Files.readAllBytes(f.toPath)
      }.toMap
      // the host's ROOT sitemap is DISCOVERED through its robots
      // `Sitemap:` directive (the real chain), falling back to the
      // conventional /sitemap.xml when the robots file doesn't say
      val root = robotsTexts.get(h)
        .flatMap(t => RobotsOps.sitemapUrls(t).headOption)
        .map(u => u.substring(u.lastIndexOf('/') + 1))
        .getOrElse("sitemap.xml")
      SitemapOps.parseSitemapHost(s"h$h.example.test", blobs, root).flatMap { u =>
        val m = "example\\.test(/doc/\\d+)".r.findFirstMatchIn(u.loc)
        val id = "/doc/(\\d+)".r.findFirstMatchIn(u.loc).map(_.group(1).toLong)
        (m, id) match {
          case (Some(pm), Some(docId)) =>
            Some((docId, h, pm.group(1), u.lastmod_day, u.priority_tenths))
          case _ => None
        }
      }
    }
    val hostMaxPub = files.filter(_.getName.startsWith("feed_h")).map { f =>
      val h = hostOf(f.getName, "feed").get
      val xml = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      val items = FeedOps.parseFeed(s"h$h.example.test", xml)
      h -> items.map(_.pub_day).foldLeft(-1L)(math.max)
    }.toMap
    FrontierConfig(rules, urlAttrs, hostMaxPub)
  }

  /** Start the lane: `sourceDir` rows carry discovered `doc_id`s. */
  def run(
      spark: SparkSession,
      sourceDir: String,
      checkpointDir: String,
      scheduleDir: String,
      stateDir: String,
      rejectsDir: String,
      configDir: String,
      waveSize: Int = 50,
      maxFilesPerTrigger: Int = 1,
      availableNow: Boolean = true,
      schemaHint: Option[StructType] = None): StreamingQuery = {
    val cfg = loadConfig(configDir)
    val sc = spark.sparkContext
    val rulesB = sc.broadcast(cfg.rules)
    val freshB = sc.broadcast(cfg.hostMaxPub)
    import spark.implicits._
    val attrs = cfg.urlAttrs
      .toDF("doc_id", "h", "path", "lastmod_day", "priority_tenths")
    val raw = spark.readStream
      .schema(schemaHint.getOrElse(spark.read.parquet(sourceDir).schema))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
    val writer = raw.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sp = batch.sparkSession
        import sp.implicits._
        // a URL discovered twice in one batch schedules once; ACROSS
        // batches a rediscovery re-ranks by design (a recrawl) — the
        // lane assumes an upstream-deduped discovery feed, which is
        // what the outlink/CDX emitters produce
        val known = batch.select(col("doc_id")).distinct()
          .join(broadcast(attrs), Seq("doc_id"), "left")
        val unknown = known.filter(col("h").isNull)
          .select(col("doc_id"), lit("unknown_url").as("reason"))
        if (!unknown.isEmpty)
          CheckpointStream.appendDiffs(unknown, rejectsDir, batchId)
        // robots verdicts via the real evaluator (broadcast rule sets)
        val gated = known.filter(col("h").isNotNull)
          .select(col("doc_id"), col("h"), col("path"),
            col("lastmod_day"), col("priority_tenths"))
          .as[(Long, Long, String, Long, Long)]
          .map { case (id, h, path, lm, prio) =>
            val rules = rulesB.value.getOrElse(h, Nil)
              .map { case (a, p) => RobotsOps.RobotsRule(a, p) }
            val (allowed, rule) = RobotsOps.decide(rules, path)
            val hi = freshB.value.getOrElse(h, -1L)
            (id, h, s"h$h.example.test", path, allowed, rule, lm, prio, hi - lm)
          }
          .toDF("doc_id", "h", "host", "path", "allowed", "rule",
            "lastmod_day", "priority_tenths", "fresh_lag")
        // per-host running offsets from the PREDECESSOR state generation
        val fs = new Path(stateDir)
          .getFileSystem(sp.sparkContext.hadoopConfiguration)
        val prevGens = (0L until batchId)
          .filter(b => fs.exists(new Path(s"$stateDir/batch_id=$b", "_SUCCESS")))
        val prevCounts: Map[Long, Long] =
          if (prevGens.isEmpty) Map.empty
          else sp.read.parquet(s"$stateDir/batch_id=${prevGens.max}")
            .as[(Long, Long)].collect().toMap // |hosts| rows — bounded
        val offsets =
          if (prevCounts.isEmpty) Seq((-1L, 0L)) else prevCounts.toSeq
        val offsetsDf = offsets.toDF("h", "host_offset")
        val rn = row_number().over(
          Window.partitionBy(col("h"), col("allowed"))
            .orderBy(col("priority_tenths").desc, col("lastmod_day").desc,
              col("doc_id")))
        val scheduled = gated
          .join(broadcast(offsetsDf), Seq("h"), "left")
          .withColumn("rn", rn + coalesce(col("host_offset"), lit(0L)))
          .drop("host_offset")
          .select(col("doc_id"), col("h"), col("host"), col("path"),
            col("allowed"), col("rule"), col("lastmod_day"),
            col("priority_tenths"), col("fresh_lag"),
            when(col("allowed"), col("rn")).otherwise(lit(-1))
              .cast("long").as("crawl_rank"),
            when(col("allowed"), (col("rn") - 1) / waveSize + 1)
              .otherwise(lit(-1)).cast("long").as("fetch_wave"))
          .persist()
        try {
          if (!scheduled.isEmpty)
            CheckpointStream.appendDiffs(scheduled.drop("h"), scheduleDir, batchId)
          // state AFTER this batch: previous counters + batch allowed counts
          val batchCounts = scheduled.filter(col("allowed"))
            .groupBy(col("h")).agg(count(lit(1)).as("c"))
            .as[(Long, Long)].collect().toMap // |hosts| rows — bounded
          val merged = (prevCounts.keySet ++ batchCounts.keySet).toSeq
            .map(h => (h, prevCounts.getOrElse(h, 0L) + batchCounts.getOrElse(h, 0L)))
          CheckpointStream.appendDiffs(
            merged.toDF("h", "n"), stateDir, batchId)
        } finally { scheduled.unpersist(); () }
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow())
     else writer.trigger(Trigger.ProcessingTime("1 second"))).start()
  }
}
