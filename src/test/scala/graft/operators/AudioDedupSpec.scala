package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Audio payload near-dup: the container layer must be invisible —
  * identical payloads walk out of Ogg pages and MP3 frames
  * byte-exactly, and pairs cross the container split.
  */
class AudioDedupSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("a re-mux is invisible: the same payloads round-trip byte-exact " +
    "through Ogg pages and MP3 frames") {
    val payloads = (0 until 7).map(i =>
      Array.tabulate[Byte](92 + 24 * (i % 3))(j =>
        ((i * 37 + j * 11) & 0xff).toByte))
    val viaOgg = OggOps.packetsOf(OggOps.buildOggRaw(0x42L, payloads))
    val viaMp3 = Mp3Ops.framePayloads(Mp3Ops.buildMp3Frames(payloads))
    assert(viaOgg.length == payloads.length && viaMp3.length == payloads.length)
    payloads.indices.foreach { i =>
      assert(java.util.Arrays.equals(viaOgg(i), payloads(i)), s"ogg packet $i")
      assert(java.util.Arrays.equals(viaMp3(i), payloads(i)), s"mp3 frame $i")
    }
  }

  test("a torn trailing MP3 frame emits nothing; the intact prefix holds") {
    val payloads = (0 until 3).map(i => Array.fill[Byte](92)(i.toByte))
    val full = Mp3Ops.buildMp3Frames(payloads)
    val torn = full.take(2 * 96 + 40) // third frame cut mid-payload
    assert(Mp3Ops.framePayloads(torn).length == 2)
  }

  test("a re-ENCODE is invisible at the sample grain: FLAC and WAV of " +
    "the same PCM decode to identical samples and identical window sigs") {
    val pcm = AudioDedupOps.pcmOf(22L) // an even q187 id: grp 21, 6 windows
    val viaFlac = FlacOps.decodePcm(
      FlacOps.encodeFlac(pcm, 1, 44100, 16, 4096)).toOption.get.samples
    assert(java.util.Arrays.equals(viaFlac, pcm),
      "FLAC round-trip must be lossless")
    val viaWav = MultimodalOps.decodeWav(AudioDedupOps.wav16(pcm, 44100))
      .get.samples.map(f => math.round(f * 32768f))
    assert(java.util.Arrays.equals(viaWav, pcm),
      "WAV round-trip must be lossless")
  }

  test("q187 on sf0.001: pairs CROSS the codec split (FLAC vs WAV) and " +
    "every pair shares a group — the q183 contract upgraded to samples") {
    val rows = AudioDedupOps.q187PcmNearDup(spark, sf).collect()
    assert(rows.nonEmpty)
    var crossCodec = 0
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(a - a % 21 == b - b % 21, s"pair ($a,$b) crosses groups")
      assert(r.getLong(2) >= 2L)
      if (a % 2 != b % 2) crossCodec += 1
    }
    assert(crossCodec > 0,
      "the corpus must produce FLAC-vs-WAV pairs (codec-blind dedup)")
  }

  test("q183 on sf0.001: pairs CROSS the container split and every " +
    "pair shares a group") {
    val rows = AudioDedupOps.q183AudioNearDup(spark, sf).collect()
    assert(rows.nonEmpty)
    var crossContainer = 0
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(a - a % 21 == b - b % 21, s"pair ($a,$b) crosses groups")
      assert(r.getLong(2) >= 2L)
      if (a % 2 != b % 2) crossContainer += 1
    }
    assert(crossContainer > 0,
      "the corpus must produce Ogg-vs-MP3 pairs (container-blind dedup)")
  }
}
