package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MP4 / ISO-BMFF container walk (ISO 14496-12) — the box structure
  * real crawls carry video in. Pure structure, codec-agnostic: boxes
  * are `[size:u32][type:4cc]` (size 1 → u64 largesize, size 0 → to
  * EOF), containers nest (`moov → trak → mdia → minf → stbl`), and the
  * sample tables resolve every sample's bytes without decoding them —
  * `stsz` (per-sample sizes), `stsc` (sample→chunk runs), `stco`
  * (chunk offsets), `stts` (durations), `hdlr` (track handler). That
  * is exactly what the dedup/signature machinery needs: samples as
  * OPAQUE payloads (the byte-histogram / signature fallback consumes
  * them; an H.264 decoder is explicitly out of scope — such tracks
  * still walk, their samples still extract).
  *
  * Codec discipline (`Jpeg`/`Webp`/`WarcOps`/`PdfOps`): offset-driven
  * (unknown boxes SKIP by size — the box walk's whole point),
  * error-as-value (truncation, lying sizes, out-of-range sample
  * offsets → typed dead-letter status, never a throw),
  * allocation-bounded (sample count and total payload caps checked
  * BEFORE allocation).
  *
  * The q137 corpus builds real two-chunk MP4s whose sample sizes and
  * payload bytes are pure (doc_id, sample, byte) arithmetic, so the
  * oracle replays counts, durations, and the full payload sha without
  * ever seeing the container — the encode→decode collapse: any box
  * mis-walk, stsc run slip, or offset error changes the hash.
  *
  * Scale shape (100 TB): per-row byte walker via `mapPartitions`, no
  * shuffle before the output sort; work linear in file size.
  */
object Mp4Ops {

  private val MaxSamples = 100000
  private val MaxPayload = 1L << 26

  final case class Mp4Info(
      doc_id: Long, status: String, n_tracks: Int, handler: String,
      n_samples: Int, n_chunks: Int, sum_sizes: Long, duration: Long,
      payload: Array[Byte])

  // ---------------------------------------------------------------- parse

  private def be32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
      ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
  private def be64(b: Array[Byte], p: Int): Long =
    (be32(b, p) << 32) | be32(b, p + 4)
  private def fourcc(b: Array[Byte], p: Int): String =
    new String(b, p, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** Child boxes of [from, until): (type, payloadStart, payloadEnd).
    * A lying size ends the walk at the lie (intact prefix kept).
    */
  private def boxes(b: Array[Byte], from: Int, until: Int): Seq[(String, Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    var p = from
    while (p + 8 <= until) {
      val size = be32(b, p)
      val typ = fourcc(b, p + 4)
      val (payloadStart, end) =
        if (size == 0) (p + 8, until.toLong)
        else if (size == 1) {
          if (p + 16 > until) return out.toSeq
          (p + 16, p + be64(b, p + 8))
        } else (p + 8, p + size)
      if (size != 0 && size != 1 && size < 8) return out.toSeq
      if (end > until || end <= p) return out.toSeq
      out += ((typ, payloadStart, end.toInt))
      p = end.toInt
    }
    out.toSeq
  }

  private def find(bs: Seq[(String, Int, Int)], typ: String): Option[(Int, Int)] =
    bs.collectFirst { case (t, s, e) if t == typ => (s, e) }

  /** Walk one track's sample tables into resolved (size, fileOffset)
    * pairs. None on any structural lie.
    */
  private def trackSamples(
      b: Array[Byte], stbl: Seq[(String, Int, Int)]): Option[Seq[(Int, Long)]] = {
    for {
      (szS, szE) <- find(stbl, "stsz")
      (scS, scE) <- find(stbl, "stsc")
      // chunk offsets come as 32-bit `stco` or the 64-bit `co64`
      // large-file form — both resolve identically
      (coS, coE, wide) <- find(stbl, "stco").map { case (a, b) => (a, b, false) }
        .orElse(find(stbl, "co64").map { case (a, b) => (a, b, true) })
      sizes <- {
        if (szE - szS < 12) None
        else {
          val uniform = be32(b, szS + 4)
          val n = be32(b, szS + 8)
          if (n < 0 || n > MaxSamples) None
          else if (uniform != 0) Some(Seq.fill(n.toInt)(uniform.toInt))
          else if (szS + 12 + 4L * n > szE) None
          else Some((0 until n.toInt).map(i => be32(b, szS + 12 + 4 * i).toInt))
        }
      }
      stsc <- {
        if (scE - scS < 8) None
        else {
          val n = be32(b, scS + 4)
          if (n < 0 || scS + 8 + 12L * n > scE) None
          else Some((0 until n.toInt).map { i =>
            val p = scS + 8 + 12 * i
            (be32(b, p).toInt, be32(b, p + 4).toInt)
          })
        }
      }
      stco <- {
        if (coE - coS < 8) None
        else {
          val n = be32(b, coS + 4)
          val ew = if (wide) 8 else 4
          if (n < 0 || coS + 8 + ew.toLong * n > coE) None
          else Some((0 until n.toInt).map(i =>
            if (wide) be64(b, coS + 8 + 8 * i) else be32(b, coS + 8 + 4 * i)))
        }
      }
      resolved <- {
        // expand stsc runs across the stco chunk list, assigning
        // consecutive samples to chunks; each sample's offset is its
        // chunk's stco base plus the sizes of its predecessors there
        val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
        var sample = 0
        var ok = stsc.nonEmpty && stsc.head._1 == 1
        var ci = 0
        while (ok && ci < stco.length && sample < sizes.length) {
          val chunkNo = ci + 1
          val perChunk = stsc.reverse.collectFirst {
            case (first, per) if first <= chunkNo => per
          }.getOrElse(0)
          if (perChunk <= 0) ok = false
          else {
            var off = stco(ci)
            var k = 0
            while (ok && k < perChunk && sample < sizes.length) {
              val sz = sizes(sample)
              if (sz < 0 || off < 0 || off + sz > b.length) ok = false
              else {
                out += ((sz, off))
                off += sz
                sample += 1
                k += 1
              }
            }
          }
          ci += 1
        }
        if (ok && sample == sizes.length) Some(out.toSeq) else None
      }
    } yield resolved
  }

  /** Full-container walk; the error-as-value contract. */
  private[graft] def extractMp4(docId: Long, b: Array[Byte]): Mp4Info = {
    def dead(status: String) = Mp4Info(docId, status, 0, "", 0, 0, 0L, 0L, Array.empty)
    val top = boxes(b, 0, b.length)
    if (find(top, "ftyp").isEmpty) return dead("not-mp4")
    find(top, "moov") match {
      case None => dead("no-moov")
      case Some((ms, me)) =>
        val traks = boxes(b, ms, me).filter(_._1 == "trak")
        if (traks.isEmpty) return dead("no-trak")
        // first video/sound track wins (single-track corpus)
        val parsed = traks.view.map { case (_, ts, te) =>
          val mdia = find(boxes(b, ts, te), "mdia")
          val mboxes = mdia.map { case (s, e) => boxes(b, s, e) }.getOrElse(Nil)
          val handler = find(mboxes, "hdlr")
            .filter { case (s, e) => e - s >= 12 }
            .map { case (s, _) => fourcc(b, s + 8) }.getOrElse("")
          val duration = find(mboxes, "mdhd")
            .filter { case (s, e) => e - s >= 24 }
            .map { case (s, _) => be32(b, s + 16) } // v0: duration at +16
            .getOrElse(0L)
          val stbl = find(mboxes, "minf")
            .map { case (s, e) => boxes(b, s, e) }
            .flatMap(mb => find(mb, "stbl"))
            .map { case (s, e) => boxes(b, s, e) }
            .getOrElse(Nil)
          (handler, duration, trackSamples(b, stbl),
            find(stbl, "stco").orElse(find(stbl, "co64"))
              .map { case (s, _) => be32(b, s + 4).toInt }.getOrElse(0))
        }.toSeq
        parsed.collectFirst { case (h, d, Some(samples), nChunks) => (h, d, samples, nChunks) } match {
          case None => dead("bad-sample-table")
          case Some((handler, duration, samples, nChunks)) =>
            val total = samples.map(_._1.toLong).sum
            if (total > MaxPayload) return dead("payload-bomb")
            val payload = new Array[Byte](total.toInt)
            var w = 0
            samples.foreach { case (sz, off) =>
              System.arraycopy(b, off.toInt, payload, w, sz)
              w += sz
            }
            Mp4Info(docId, "ok", traks.length, handler, samples.length,
              nChunks, total, duration, payload)
        }
    }
  }

  // ---------------------------------------------------------------- encode

  private final class BoxWriter {
    val bos = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Unit = {
      bos.write(((v >> 24) & 0xff).toInt); bos.write(((v >> 16) & 0xff).toInt)
      bos.write(((v >> 8) & 0xff).toInt); bos.write((v & 0xff).toInt)
    }
    def tag(t: String): Unit =
      bos.write(t.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    def box(t: String)(body: BoxWriter => Unit): Unit = {
      val inner = new BoxWriter
      body(inner)
      u32(8L + inner.bos.size())
      tag(t)
      inner.bos.writeTo(bos)
    }
  }

  /** Deterministic sample geometry shared by encoder, oracle, and spec:
    * `n = 4 + id % 9` samples, `size_i = 16 + (id*7 + i*13) % 48`,
    * byte j of sample i = `(id + 31*i + j) % 256`; two chunks split
    * ceil(n/2) / rest.
    */
  private[graft] def sampleCount(id: Long): Int = (4 + id % 9).toInt
  private[graft] def sampleSize(id: Long, i: Int): Int =
    (16 + (id * 7 + i * 13) % 48).toInt
  private[graft] def sampleBytes(id: Long, i: Int): Array[Byte] =
    Array.tabulate(sampleSize(id, i))(j => ((id + 31L * i + j) % 256).toByte)

  /** A real two-chunk single-track MP4 from the arithmetic geometry;
    * odd ids write their chunk offsets as 64-bit `co64` (the
    * large-file form), even ids as 32-bit `stco` — both walk to the
    * same samples, so the q137 hash is offset-form-independent.
    */
  private[graft] def buildMp4(id: Long): Array[Byte] =
    buildMp4From((0 until sampleCount(id)).map(sampleBytes(id, _)),
      wideOffsets = id % 2 == 1)

  /** Ordered sample payloads of a container (the opaque-sample feed for
    * the signature/dedup machinery).
    */
  private[graft] def sampleSlices(b: Array[Byte]): Option[Seq[Array[Byte]]] = {
    val info = extractMp4(0L, b)
    if (info.status != "ok") None
    else {
      // payload is the in-order concatenation; re-split by the sizes
      val sizes = {
        val top = boxes(b, 0, b.length)
        val (ms, me) = find(top, "moov").get
        val stbl = boxes(b, ms, me).collectFirst { case ("trak", ts, te) =>
          boxes(b, ts, te).collectFirst { case ("mdia", s, e) =>
            boxes(b, s, e).collectFirst { case ("minf", fs, fe) =>
              boxes(b, fs, fe).collectFirst { case ("stbl", ss, se) =>
                boxes(b, ss, se)
              }
            }.flatten
          }.flatten
        }.flatten.getOrElse(Nil)
        find(stbl, "stsz").map { case (s, _) =>
          val n = be32(b, s + 8).toInt
          (0 until n).map(i => be32(b, s + 12 + 4 * i).toInt)
        }.getOrElse(Nil)
      }
      var off = 0
      Some(sizes.map { sz =>
        val a = java.util.Arrays.copyOfRange(info.payload, off, off + sz)
        off += sz
        a
      })
    }
  }

  /** Build the container from explicit sample payloads. */
  private[graft] def buildMp4From(
      samples: Seq[Array[Byte]], wideOffsets: Boolean = false): Array[Byte] = {
    val n = samples.length
    val nA = (n + 1) / 2
    val sizes = samples.map(_.length)
    // layout: ftyp(24) moov(?) mdat(8 + payload); stco needs mdat's
    // absolute payload offsets, so build moov with placeholders sized
    // identically, measure, then rebuild with real offsets
    def mkMoov(c1: Long, c2: Long): Array[Byte] = {
      val w = new BoxWriter
      w.box("moov") { m =>
        m.box("mvhd") { v =>
          v.u32(0); v.u32(0); v.u32(0); v.u32(1000); v.u32(n * 100L)
        }
        m.box("trak") { t =>
          t.box("tkhd") { v => v.u32(0); v.u32(0); v.u32(0); v.u32(1) }
          t.box("mdia") { d =>
            d.box("mdhd") { v =>
              v.u32(0); v.u32(0); v.u32(0); v.u32(1000); v.u32(n * 100L)
              v.u32(0x55c40000L) // language 'und' + pre_defined
            }
            d.box("hdlr") { v =>
              v.u32(0); v.u32(0); v.tag("vide"); v.u32(0); v.u32(0); v.u32(0)
            }
            d.box("minf") { f =>
              f.box("stbl") { s =>
                s.box("stsd") { v => v.u32(0); v.u32(0) }
                s.box("stts") { v =>
                  v.u32(0); v.u32(1); v.u32(n.toLong); v.u32(100)
                }
                s.box("stsc") { v =>
                  if (n - nA > 0) {
                    v.u32(0); v.u32(2)
                    v.u32(1); v.u32(nA.toLong); v.u32(1)
                    v.u32(2); v.u32((n - nA).toLong); v.u32(1)
                  } else {
                    v.u32(0); v.u32(1)
                    v.u32(1); v.u32(nA.toLong); v.u32(1)
                  }
                }
                s.box("stsz") { v =>
                  v.u32(0); v.u32(0); v.u32(n.toLong)
                  sizes.foreach(sz => v.u32(sz.toLong))
                }
                s.box(if (wideOffsets) "co64" else "stco") { v =>
                  def off(x: Long): Unit =
                    if (wideOffsets) { v.u32(x >> 32); v.u32(x & 0xffffffffL) }
                    else v.u32(x)
                  if (n - nA > 0) { v.u32(0); v.u32(2); off(c1); off(c2) }
                  else { v.u32(0); v.u32(1); off(c1) }
                }
              }
            }
          }
        }
      }
      w.bos.toByteArray
    }
    val ftyp = {
      val w = new BoxWriter
      w.box("ftyp") { v => v.tag("isom"); v.u32(0); v.tag("isom"); v.tag("iso2") }
      w.bos.toByteArray
    }
    val moovLen = mkMoov(0, 0).length // placeholder offsets: same size
    val mdatPayloadOff = ftyp.length + moovLen + 8L
    val chunk1Len = sizes.take(nA).map(_.toLong).sum
    val moov = mkMoov(mdatPayloadOff, mdatPayloadOff + chunk1Len)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(ftyp)
    bos.write(moov)
    val payload = samples.flatMap(_.toSeq).toArray
    val w = new BoxWriter
    w.u32(8L + payload.length); w.tag("mdat")
    w.bos.writeTo(bos)
    bos.write(payload)
    bos.toByteArray
  }

  // ------------------------------------------------------------------ q137

  /** q137: the ISO-BMFF walk end-to-end — build a real two-chunk MP4
    * per document, walk boxes, resolve the stsc/stsz/stco sample
    * tables, extract every sample's opaque bytes, and emit counts,
    * duration, and the payload sha (over the uppercase hex of the
    * concatenated samples), all replayed by the oracle from the pure
    * (doc_id, sample, byte) geometry.
    */
  def q137Mp4Extract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions(_.map(id => extractMp4(id, buildMp4(id))))
      .toDF()
      .select(col("doc_id"), col("status"),
        col("n_tracks").cast("long").as("n_tracks"),
        col("handler"),
        col("n_samples").cast("long").as("n_samples"),
        col("n_chunks").cast("long").as("n_chunks"),
        col("sum_sizes").cast("long").as("sum_sizes"),
        col("duration").cast("long").as("duration"),
        sha2(hex(col("payload")), 256).as("payload_sha"))
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------------------------ q171

  /** MP4 near-dup corpus with PLANTED shared sample runs — the q133
    * content-ID scheme lifted to the container modality: the
    * `doc_id % 3 == 1` slice as real MP4s whose FIRST FIVE samples'
    * bytes derive from the video's GROUP (`doc_id − doc_id % 21`) and
    * the rest from the video itself (constant-fill samples, so each
    * byte histogram is single-bin and pure arithmetic for the oracle);
    * odd ids use `co64` wide offsets — a re-muxed container must dedup
    * identically.
    */
  private[graft] def nearDupMp4s(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"))
      .where(col("doc_id") % 3 === 1)
      .repartition(col("doc_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        val grp = id - id % 21
        val n = (6 + id % 5).toInt
        // two-tone fills (alternating c/d bytes): the histogram carries
        // a (bin(c), bin(d), length) triple per sample, so accidental
        // cross-group runs of equal signatures — easy for single-tone
        // fills in a 16-bin space — don't arise
        val samples = (0 until n).map { i =>
          val (c, d, l) =
            if (i < 5) (((grp * 5 + 29L * i) % 256).toInt,
              ((grp * 9 + 47L * i) % 256).toInt,
              (24 + (grp + i) % 16).toInt)
            else (((id * 7 + 31L * i) % 256).toInt,
              ((id * 11 + 53L * i) % 256).toInt,
              (24 + (id + i) % 16).toInt)
          Array.tabulate[Byte](l)(j => if (j % 2 == 0) c.toByte else d.toByte)
        }
        (id, buildMp4From(samples, wideOffsets = id % 2 == 1))
      })
      .toDF("asset_id", "mp4")
  }

  /** Opaque-sample signatures: walk the REAL container (stsc/stsz/stco
    * via `sampleSlices`), then the decoder-free fallback signature —
    * a 16-bin byte histogram per sample (raw counts, ':'-joined).
    * Undecodable containers contribute no rows (the q133 discipline).
    */
  private[graft] def mp4SampleSigs(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, b) =>
        sampleSlices(b).toSeq.flatten.zipWithIndex.map { case (s, i) =>
          val hist = new Array[Long](16)
          s.foreach(x => hist((x & 0xff) / 16) += 1)
          (id, i.toLong, hist.mkString(":"))
        }
      })
      .toDF("asset_id", "frame_idx", "sig")
  }

  /** q171: real video CONTAINERS through the near-dup machinery —
    * MP4s walk to their samples, samples signature as byte histograms
    * (no codec needed), and the q133 digest equi-join (same Σdf²
    * bound) pairs same-group containers on their shared 5-sample run;
    * every histogram, shingle digest, and pair count replayed by the
    * oracle from the (doc_id, sample) arithmetic.
    */
  def q171Mp4NearDup(spark: SparkSession, dir: String): DataFrame =
    MultimodalOps.signatureNearDup(mp4SampleSigs(nearDupMp4s(spark, dir)))
      .orderBy(col("vid_a"), col("vid_b"))
}
