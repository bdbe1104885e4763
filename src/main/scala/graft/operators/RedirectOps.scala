package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HTTP redirect-chain resolution — the URL-alias graph a crawler
  * collapses BEFORE any URL-keyed dedup or ranking: 3xx records map
  * request URLs to Location targets, chains must follow to the final
  * 200, and a cycle must surface TYPED (`is_loop`), never spin.
  *
  * Spark-first shape: resolution is BOUNDED-HOP — `MaxHops` chained
  * equi-joins on the url key (the declared cap every production
  * resolver has; an unbounded to-fixpoint iteration is exactly the
  * job a crawler never runs on 100 TB). Each hop is one equi-join of
  * frontier-sized frames; a chain longer than the cap reports
  * `unresolved` rather than a wrong answer.
  *
  * The corpus grounds the graph in REAL WARC bytes: 301/302 records
  * with Location headers walked by the generic record walk
  * (`WetOps.walkRecords`), statuses and targets parsed from the HTTP
  * payloads — so the container path, not a synthetic edge list, feeds
  * the resolver.
  */
object RedirectOps {

  private[graft] val MaxHops = 4

  /** One WARC response record string (the q146 shape) with an HTTP
    * status line and optional Location header.
    */
  private def record(id: Long, status: Int, location: Option[String]): String = {
    val http = s"HTTP/1.1 $status x\r\n" +
      location.map(l => s"Location: $l\r\n").getOrElse("") +
      "Content-Type: text/html\r\n\r\nbody " + id
    s"WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Target-URI: https://example.test/doc/$id\r\n" +
      s"Content-Length: ${http.getBytes("UTF-8").length}\r\n\r\n$http\r\n\r\n"
  }

  /** Redirect corpus: per 5-block, a 4→3→2→1→0 chain (`id % 5 == c`
    * hops from the 200 at the block base); `id % 50 == 49` docs
    * SELF-LOOP instead. Archives group by `id % 8` — a multi-record
    * walk, not one record per blob.
    */
  private[graft] def syntheticRedirectWarc(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .map { id =>
        val rec =
          if (id % 50 == 49)
            record(id, 301, Some(s"https://example.test/doc/$id"))
          else if (id % 5 == 0) record(id, 200, None)
          else record(id, if (id % 2 == 0) 302 else 301,
            Some(s"https://example.test/doc/${id - 1}"))
        (id % 8, id, rec)
      }
      .groupByKey(_._1)
      .mapGroups { (gid, it) =>
        val recs = it.toSeq.sortBy(_._2).map(_._3)
        (gid, recs.mkString("").getBytes("UTF-8"))
      }
      .toDF("group_id", "warc")
  }

  /** Walk archives to (url, status, location) edges via the generic
    * record walk; the HTTP payload parses for the status line and
    * Location header (record-grain error-as-value).
    */
  private[graft] def redirectEdges(spark: SparkSession, warcs: DataFrame): DataFrame = {
    import spark.implicits._
    warcs.select(col("warc")).as[Array[Byte]]
      .mapPartitions(_.flatMap { bytes =>
        WetOps.walkRecords(bytes).flatMap { case (headers, payload, _) =>
          headers.get("warc-target-uri").flatMap { uri =>
            val eol = payload.indexOf("\r\n")
            if (eol < 0 || !payload.startsWith("HTTP/")) None
            else {
              val parts = payload.substring(0, eol).split(" ")
              val status = if (parts.length >= 2) parts(1).toIntOption else None
              val loc = payload.substring(0, payload.indexOf("\r\n\r\n") max 0)
                .split("\r\n").collectFirst {
                  case l if l.toLowerCase.startsWith("location:") =>
                    l.substring(l.indexOf(':') + 1).trim
                }
              status.map(st => (uri, st, loc.orNull))
            }
          }
        }
      })
      .toDF("url", "status", "location")
  }

  /** Bounded-hop resolution over the edge frame: every url gets its
    * final target, hop count, and flags (`is_loop` when the walk
    * revisits a url; `unresolved` when the cap is hit without a
    * non-redirect).
    *
    * CONTRACT: cycle detection only sees the first `MaxHops` steps — a
    * loop whose first revisit lies beyond the cap reports
    * `unresolved=true`, not `is_loop=true` (the walk stopped before it
    * could observe the revisit). That is the deliberate bounded-hop
    * semantics (real resolvers cap at 4–10 hops and treat past-cap
    * chains as failures regardless of shape); callers reusing
    * `resolve` on edge data with longer cycles should raise `MaxHops`
    * rather than read `unresolved` as "acyclic".
    */
  private[graft] def resolve(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // (url, status, location) — follow while status is 3xx
    var cur = edges.select(col("url"),
      col("url").as("at"), col("status").as("at_status"),
      col("location").as("at_loc"),
      lit(0).as("hops"), lit(false).as("is_loop"),
      array(col("url")).as("path"))
    var hop = 0
    while (hop < MaxHops) {
      val step = cur.alias("c")
        .join(edges.alias("e"), col("c.at_loc") === col("e.url"), "left")
      cur = step.select(
        col("c.url").as("url"),
        when(col("c.at_status").between(300, 399) && col("c.at_loc").isNotNull
          && col("e.url").isNotNull, col("e.url"))
          .otherwise(col("c.at")).as("at"),
        when(col("c.at_status").between(300, 399) && col("c.at_loc").isNotNull
          && col("e.url").isNotNull, col("e.status"))
          .otherwise(col("c.at_status")).as("at_status"),
        when(col("c.at_status").between(300, 399) && col("c.at_loc").isNotNull
          && col("e.url").isNotNull, col("e.location"))
          .otherwise(when(col("c.at_status").between(300, 399), lit(null))
            .otherwise(col("c.at_loc"))).as("at_loc"),
        when(col("c.at_status").between(300, 399) && col("c.at_loc").isNotNull
          && col("e.url").isNotNull, col("c.hops") + 1)
          .otherwise(col("c.hops")).as("hops"),
        (col("c.is_loop") ||
          coalesce(col("c.at_status").between(300, 399) &&
            array_contains(col("c.path"), col("c.at_loc")), lit(false)))
          .as("is_loop"),
        when(col("c.at_status").between(300, 399) && col("c.at_loc").isNotNull
          && col("e.url").isNotNull,
          array_union(col("c.path"), array(col("e.url"))))
          .otherwise(col("c.path")).as("path"))
      hop += 1
    }
    cur.select(col("url"),
      when(col("is_loop"), lit("")).otherwise(col("at")).as("final_url"),
      when(col("is_loop"), lit(-1L)).otherwise(col("hops").cast("long"))
        .as("n_hops"),
      col("is_loop"),
      (!col("is_loop") && col("at_status").between(300, 399)).as("unresolved"))
  }

  /** q179: redirect resolution end to end — WARC-borne 301/302 chains
    * (4 hops max by construction) collapse to their block-base 200s,
    * self-loops surface typed; url, final target, hop count, and both
    * flags replayed by the oracle from the chain arithmetic.
    */
  def q179RedirectResolve(spark: SparkSession, dir: String): DataFrame = {
    val edges = redirectEdges(spark,
      syntheticRedirectWarc(Tables.documents(spark, dir)))
    resolve(edges)
      .select(
        regexp_extract(col("url"), "doc/(\\d+)$", 1).cast("long").as("doc_id"),
        col("url"), col("final_url"), col("n_hops"), col("is_loop"),
        col("unresolved"))
      .orderBy(col("doc_id"))
  }
}
