package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Audio near-duplicate detection at the PAYLOAD grain — the q171
  * fallback (opaque samples → byte histograms → digest equi-join)
  * extended to audio CONTAINERS: the same recording re-muxed from Ogg
  * to MP3 must dedup against its original, so signatures are computed
  * over what the container CARRIES (Ogg packets, MP3 frame payloads),
  * never over container bytes.
  *
  * Corpus: the `doc_id % 3 == 2` third, each asset 6–10 payloads of
  * 92 two-tone bytes (the one length a 32 kbps / 48 kHz MPEG-1
  * Layer III frame carries, so both containers hold IDENTICAL bytes);
  * the first 5 payloads are shared per 21-id group — planted across
  * the container split (even ids → Ogg, odd ids → MP3), so every
  * reported pair proves container-blind dedup. Payloads walk out
  * through the REAL q174/q153 machinery (page+lacing assembly, ID3v2
  * skip + computed-length frames), histogram exactly like q171, and
  * pair through `signatureNearDup` — the same Σ_{df≤cap} df² bound,
  * never all-pairs.
  *
  * Scale shape (100 TB): per-row container walks, one digest-grain
  * exchange inside the shared near-dup core; the pairing is a digest
  * EQUI-join (plan-pinned).
  */
object AudioDedupOps {

  /** One asset's payloads from the q171 two-tone arithmetic; lengths
    * cycle 92/116/140 (the 48 kHz MPEG-1 frame cells) so the
    * signature keeps q171's (c, d, length) discrimination — a fixed
    * length would leave only 256 bin-pair signatures and accidental
    * cross-group shingle runs.
    */
  private def payloadsOf(id: Long): Seq[Array[Byte]] = {
    val grp = id - id % 21
    val n = (6 + id % 5).toInt
    (0 until n).map { i =>
      val (c, d, l) =
        if (i < 5) (((grp * 5 + 29L * i) % 256).toInt,
          ((grp * 9 + 47L * i) % 256).toInt,
          (92 + 24 * ((grp + i) % 3)).toInt)
        else (((id * 7 + 31L * i) % 256).toInt,
          ((id * 11 + 53L * i) % 256).toInt,
          (92 + 24 * ((id + i) % 3)).toInt)
      Array.tabulate[Byte](l)(j => if (j % 2 == 0) c.toByte else d.toByte)
    }
  }

  /** The mixed-container corpus: even ids as raw-packet Ogg streams,
    * odd ids as CBR MP3 frame streams, SAME payload arithmetic.
    */
  private[graft] def nearDupAudio(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"))
      .where(col("doc_id") % 3 === 2)
      .repartition(col("doc_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        val p = payloadsOf(id)
        val bytes =
          if (id % 2 == 0) OggOps.buildOggRaw(0x2000 + id % 9000, p)
          else Mp3Ops.buildMp3Frames(p)
        (id, if (id % 2 == 0) "ogg" else "mp3", bytes)
      })
      .toDF("asset_id", "container", "audio")
  }

  /** Payload signatures through each container's REAL walker: 16-bin
    * byte histograms (the q171 signature), one row per payload.
    * Undecodable containers contribute no rows (the q133 discipline).
    */
  private[graft] def audioPayloadSigs(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.as[(Long, String, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, kind, b) =>
        val payloads =
          if (kind == "ogg") OggOps.packetsOf(b)
          else Mp3Ops.framePayloads(b)
        payloads.zipWithIndex.map { case (s, i) =>
          val hist = new Array[Long](16)
          s.foreach(x => hist((x & 0xff) / 16) += 1)
          (id, i.toLong, hist.mkString(":"))
        }
      })
      .toDF("asset_id", "frame_idx", "sig")
  }

  /** q183: audio containers through the near-dup machinery — Ogg
    * packets and MP3 frame payloads signature identically, so
    * same-group assets pair ACROSS the container split on their shared
    * 5-payload run; every histogram, shingle digest, and pair count
    * replayed by the oracle from the (doc_id, payload) arithmetic.
    */
  def q183AudioNearDup(spark: SparkSession, dir: String): DataFrame =
    MultimodalOps.signatureNearDup(audioPayloadSigs(nearDupAudio(spark, dir)))
      .orderBy(col("vid_a"), col("vid_b"))

  // ----------------------------------------------- q187: SAMPLE grain

  /** Analysis-window size for sample-grain fingerprints: a fixed,
    * container-independent segmentation of the decoded PCM stream (the
    * audio-fingerprinting norm) — FLAC frame boundaries and WAV's
    * framelessness both disappear under it.
    */
  private[graft] val WindowSamples = 128

  /** One asset's PCM for the q187 corpus: `6 + id%5` windows of 128
    * mono 16-bit samples; window i holds a step from tone `c` to tone
    * `d` at duty point k (all three from grp arithmetic for i < 5 —
    * the planted shared run — and id arithmetic after). Samples sit on
    * the `value*256 - 32768` grid so the 16-bin histogram bins equal
    * the byte-arithmetic bins the oracle replays.
    */
  private[graft] def pcmOf(id: Long): Array[Int] = {
    val grp = id - id % 21
    val n = (6 + id % 5).toInt
    val out = new Array[Int](n * WindowSamples)
    var i = 0
    while (i < n) {
      val (c, d, k) =
        if (i < 5) (((grp * 5 + 29L * i) % 256).toInt,
          ((grp * 9 + 47L * i) % 256).toInt,
          (32 + (grp * 13 + 7L * i) % 64).toInt)
        else (((id * 7 + 31L * i) % 256).toInt,
          ((id * 11 + 53L * i) % 256).toInt,
          (32 + (id * 13 + 7L * i) % 64).toInt)
      var j = 0
      while (j < WindowSamples) {
        out(i * WindowSamples + j) = (if (j < k) c else d) * 256 - 32768
        j += 1
      }
      i += 1
    }
    out
  }

  /** 16-bit PCM → canonical WAV (the `encodeWavSilence` layout with
    * real sample data).
    */
  private[graft] def wav16(samples: Array[Int], rate: Int): Array[Byte] = {
    val out = MultimodalOps.encodeWavSilence(rate, 1, samples.length)
    var i = 0
    while (i < samples.length) {
      out(44 + 2 * i) = (samples(i) & 0xff).toByte
      out(44 + 2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** The cross-CODEC corpus: even ids FLAC-encoded (the real RFC 9639
    * encoder — fixed predictors + Rice residuals over the step
    * signal), odd ids canonical WAV, SAME sample arithmetic.
    */
  private[graft] def nearDupPcm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"))
      .where(col("doc_id") % 3 === 1)
      .repartition(col("doc_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        val pcm = pcmOf(id)
        val bytes =
          if (id % 2 == 0) FlacOps.encodeFlac(pcm, 1, 44100, 16, 4096)
          else wav16(pcm, 44100)
        (id, if (id % 2 == 0) "flac" else "wav", bytes)
      })
      .toDF("asset_id", "container", "audio")
  }

  /** Sample-grain signatures through each codec's REAL decoder: FLAC
    * frames through `FlacOps.decodePcm` (predictors, Rice, CRCs), WAV
    * through `decodeWav`; the flat PCM stream then windows UNIFORMLY
    * (128 samples) and each window signatures as a 16-bin histogram of
    * the sample's high nibble — identical streams give identical sigs
    * no matter which container carried them. Undecodable assets
    * contribute no rows (the q133 discipline).
    */
  private[graft] def pcmWindowSigs(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.as[(Long, String, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, kind, b) =>
        val samples: Array[Int] =
          if (kind == "flac")
            FlacOps.decodePcm(b).map(_.samples).getOrElse(Array.empty[Int])
          else
            MultimodalOps.decodeWav(b)
              .map(_.samples.map(f => math.round(f * 32768f)))
              .getOrElse(Array.empty[Int])
        val nWin = samples.length / WindowSamples
        (0 until nWin).map { w =>
          val hist = new Array[Long](16)
          var j = 0
          while (j < WindowSamples) {
            hist((samples(w * WindowSamples + j) + 32768) >> 12) += 1
            j += 1
          }
          (id, w.toLong, hist.mkString(":"))
        }
      })
      .toDF("asset_id", "frame_idx", "sig")
  }

  /** q187: cross-CODEC audio near-dup at the SAMPLE grain — the same
    * recording shipped as FLAC and as WAV must pair, which payload-byte
    * signatures (q183) structurally cannot do: the FLAC decode
    * (predictors + Rice residuals, RFC 9639) and the WAV read converge
    * on identical PCM, uniform 128-sample windows erase the container
    * framing, and same-group assets pair across the codec split on
    * their shared 5-window run; every histogram, shingle digest, and
    * pair count replayed by the oracle from the (doc_id, window)
    * arithmetic. Scale shape: per-row decode walks, one digest-grain
    * exchange in the shared near-dup core (the Σ_{df≤cap} df² bound).
    */
  def q187PcmNearDup(spark: SparkSession, dir: String): DataFrame =
    MultimodalOps.signatureNearDup(pcmWindowSigs(nearDupPcm(spark, dir)))
      .orderBy(col("vid_a"), col("vid_b"))
}
