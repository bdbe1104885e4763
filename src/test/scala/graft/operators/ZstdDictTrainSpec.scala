package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** COVER-style dictionary training (ZstdDict.train), round 20.
  *
  * Three contracts, per the round-19 brief:
  *  1. the TRAINED dict beats the round-19 SAMPLED-prefix dict's
  *     compressed total on a q195-style corpus (both numbers pinned);
  *  2. frames written under the trained dict stay byte-exact through
  *     foreign libzstd (`tools/verify_zstd_encoder.py`, ctypes);
  *  3. the trained dict's corpus total is within 1.25x of a genuine
  *     `ZDICT_trainFromBuffer` dictionary on the same samples, both
  *     measured by the SAME foreign compressor
  *     (`tools/compare_zdict.py`) so only CONTENT quality differs.
  */
class ZstdDictTrainSpec extends AnyFunSuite {

  private val utf8 = java.nio.charset.StandardCharsets.UTF_8

  /** q195-shaped records: shared WARC/HTTP skeleton + shared corpus
    * vocabulary + per-record unique material (ids, hashes, tails).
    */
  private def records(n: Int): Seq[Array[Byte]] = (0 until n).map { i =>
    val vocab = Seq("analytics", "pipeline", "checkpoint", "sessions",
      "training", "documents", "embedding", "throughput")
    val body = (0 until 10).map { j =>
      s"<p class=${'"'}body-text${'"'}>Paragraph $j of record $i " +
        s"about ${vocab((i + j) % vocab.length)} and " +
        s"${vocab((i * 3 + j) % vocab.length)} workloads, unique " +
        s"tail ${(i * 1103515245L + j * 12345L).toHexString}.</p>"
    }.mkString
    (s"WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Target-URI: https://example.com/doc/$i\r\n" +
      s"Content-Type: application/http; msgtype=response\r\n\r\n" +
      s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      s"<html><head><title>Record $i</title></head><body>$body" +
      s"</body></html>\r\n\r\n").getBytes(utf8)
  }

  private def sampledPrefixDict(recs: Seq[Array[Byte]], cap: Int): Array[Byte] = {
    // the round-19 baseline: leading records verbatim up to the cap
    val bos = new java.io.ByteArrayOutputStream()
    recs.iterator.takeWhile(_ => bos.size < cap).foreach(bos.write)
    bos.toByteArray
  }

  private def totalWith(recs: Seq[Array[Byte]], dict: Array[Byte]): Long =
    recs.map(r => Zstd.encode(r, dict, dictId = 0x47524654L).length.toLong).sum

  test("trained dict beats the sampled-prefix baseline on the " +
    "q195-style corpus; frames round-trip through our own decoder") {
    val recs = records(64)
    val raw = recs.map(_.length.toLong).sum
    val sampled = sampledPrefixDict(recs, 8192)
    val trained = ZstdDict.trainForCorpus(recs, 8192)
    assert(trained.length >= 8 && trained.length <= 8192)
    val tSampled = totalWith(recs, sampled)
    val tTrained = totalWith(recs, trained)
    info(f"raw $raw%d sampled $tSampled%d (${tSampled.toDouble / raw}%.4f) " +
      f"trained $tTrained%d (${tTrained.toDouble / raw}%.4f)")
    assert(tTrained < tSampled,
      s"trained dict ($tTrained) must beat sampled prefix ($tSampled)")
    assert(tTrained.toDouble / raw < 0.15, "q195-style corpus must stay <0.15")
    // and the frames decode byte-exact under the same dict
    val blob = Zstd.encodeStructuredDict(0x47524654L, trained)
    val dict = Zstd.parseDictionary(blob).fold(r => fail(r), identity)
    recs.foreach { r =>
      Zstd.decode(Zstd.encode(r, trained, 0x47524654L), 1 << 26, dict) match {
        case Right(out) => assert(java.util.Arrays.equals(out, r))
        case Left(reason) => fail(s"decode under trained dict: $reason")
      }
    }
  }

  test("training is deterministic, respects the budget, and survives " +
    "degenerate corpora") {
    val recs = records(32)
    val a = ZstdDict.train(recs, 4096)
    val b = ZstdDict.train(recs, 4096)
    assert(java.util.Arrays.equals(a, b), "training must be deterministic")
    assert(a.length <= 4096)
    // tiny corpus: falls back to leading bytes, never throws
    val tiny = ZstdDict.train(Seq("abc".getBytes(utf8)), 1024)
    assert(java.util.Arrays.equals(tiny, "abc".getBytes(utf8)))
    // uniform corpus: one segment covers everything; result is usable
    val uni = ZstdDict.train(Seq(Array.fill[Byte](4000)(7)), 1024, k = 256)
    assert(uni.length >= 8 && uni.length <= 1024)
    // trained content actually comes from the corpus (it is a window
    // substring per selection — check containment for a small case)
    val one = records(2)
    val d1 = ZstdDict.train(one, 512, k = 128)
    val hay = one.reduce(_ ++ _)
    val seg = d1.take(math.min(128, d1.length))
    assert(hay.containsSlice(seg), "selections must be corpus substrings")
  }

  test("TREELESS literals via the dict-carried Huffman table: frames " +
    "shrink, round-trip through our decoder, and uncovered symbols " +
    "fall back to a fresh per-block tree") {
    val recs = records(64)
    val raw = recs.map(_.length.toLong).sum
    val dict = ZstdDict.trainForCorpus(recs, 8192)
    val hist = dict ++ recs.take(40).reduce(_ ++ _)
    val (blob, huf) =
      Zstd.encodeStructuredDictTrained(0x47524654L, dict, hist)
    assert(huf != null, "histogram sample must yield a table")
    val without = totalWith(recs, dict)
    val withT = recs.map(r => Zstd.encode(r, dict, 0x47524654L,
      checksum = false, dictHuf = huf).length.toLong).sum
    info(f"without table ${without.toDouble / raw}%.4f, treeless " +
      f"${withT.toDouble / raw}%.4f")
    assert(withT < without,
      s"dict-table frames ($withT) must beat per-frame trees ($without)")
    val pd = Zstd.parseDictionary(blob).fold(r => fail(r), identity)
    recs.foreach { r =>
      val enc = Zstd.encode(r, dict, 0x47524654L, checksum = true,
        dictHuf = huf)
      Zstd.decode(enc, 1 << 26, pd) match {
        case Right(got) => assert(java.util.Arrays.equals(got, r))
        case Left(reason) => fail(s"treeless decode: $reason")
      }
    }
    // a record full of symbols the histogram never saw: the covers()
    // gate must route it through a fresh tree (or raw) and still
    // round-trip — the treeless path can never corrupt
    val exotic = Array.tabulate[Byte](3000)(i => (200 + (i * 7) % 55).toByte)
    val encEx = Zstd.encode(exotic, dict, 0x47524654L, checksum = false,
      dictHuf = huf)
    Zstd.decode(encEx, 1 << 26, pd) match {
      case Right(got) => assert(java.util.Arrays.equals(got, exotic))
      case Left(reason) => fail(s"exotic decode: $reason")
    }
  }

  test("FOREIGN: libzstd decodes TREELESS frames under the " +
    "trained-table dict byte-exact") {
    val py = pythonBin()
    assume(py.nonEmpty, "python3 not present")
    val recs = records(48)
    val dict = ZstdDict.trainForCorpus(recs, 8192)
    val hist = dict ++ recs.take(30).reduce(_ ++ _)
    val (blob, huf) =
      Zstd.encodeStructuredDictTrained(0x47524654L, dict, hist)
    assume(huf != null)
    val dir = java.nio.file.Files.createTempDirectory("graft_treeless")
    java.nio.file.Files.write(dir.resolve("dict.bin"), blob)
    java.nio.file.Files.write(dir.resolve("dictcase.bin"), recs.head)
    java.nio.file.Files.write(dir.resolve("dictcase.zst"),
      Zstd.encode(recs.head, dict, 0x47524654L, checksum = true,
        dictHuf = huf))
    val proc = new ProcessBuilder(py, "tools/verify_zstd_encoder.py",
      dir.toString).redirectErrorStream(true).start()
    val out = new String(proc.getInputStream.readAllBytes())
    assert(proc.waitFor() == 0 && out.contains("ALL OK"), s"foreign:\n$out")
  }

  test("FOREIGN: libzstd decodes frames under the trained dict " +
    "byte-exact (structured blob via ZSTD_decompress_usingDict)") {
    val py = pythonBin()
    assume(py.nonEmpty, "python3 not present")
    val recs = records(48)
    val trained = ZstdDict.train(recs, 8192)
    val dir = java.nio.file.Files.createTempDirectory("graft_zdict_dec")
    def put(name: String, b: Array[Byte]): Unit =
      java.nio.file.Files.write(dir.resolve(name), b)
    put("dict.bin", Zstd.encodeStructuredDict(0x47524654L, trained))
    put("dictcase.bin", recs.head)
    put("dictcase.zst", Zstd.encode(recs.head, trained, 0x47524654L))
    val proc = new ProcessBuilder(py, "tools/verify_zstd_encoder.py",
      dir.toString).redirectErrorStream(true).start()
    val out = new String(proc.getInputStream.readAllBytes())
    assert(proc.waitFor() == 0 && out.contains("ALL OK"), s"foreign:\n$out")
  }

  test("FOREIGN: trained dict within 1.25x of ZDICT_trainFromBuffer " +
    "on the same samples (same libzstd compressor for both)") {
    // Two measurements, both by the SAME foreign compressor:
    //  - RAW-CONTENT mode (ZSTD_dct_rawContent for BOTH dicts):
    //    content-for-content — the 1.25x gate, because dictionary
    //    CONTENT is the only part our encoder consumes (it writes
    //    per-block Huffman + predefined FSE, never dict-global
    //    entropy tables).
    //  - FULL mode (auto): the ZDICT blob additionally carries
    //    trained entropy tables our structured blob doesn't —
    //    recorded for honesty, not gated (measured ~25% of ZDICT's
    //    edge comes from those tables alone).
    val py = pythonBin()
    assume(py.nonEmpty, "python3 not present")
    val recs = records(64)
    val trained = ZstdDict.trainForCorpus(recs, 8192)
    val dir = java.nio.file.Files.createTempDirectory("graft_zdict_cmp")
    recs.zipWithIndex.foreach { case (r, i) =>
      java.nio.file.Files.write(dir.resolve(f"sample_$i%03d.bin"), r)
    }
    java.nio.file.Files.write(dir.resolve("ours_dict.bin"), trained)
    val proc = new ProcessBuilder(py, "tools/compare_zdict.py",
      dir.toString).redirectErrorStream(true).start()
    val out = new String(proc.getInputStream.readAllBytes())
    assert(proc.waitFor() == 0, s"compare_zdict failed:\n$out")
    val m = ("""ZDICT (\d+) OURS (\d+) ZDICTRAW (\d+) OURSRAW (\d+) """ +
      """RAW (\d+)""").r.findFirstMatchIn(out)
      .getOrElse(fail(s"unparseable:\n$out"))
    val (zd, ours) = (m.group(1).toLong, m.group(2).toLong)
    val (zdRaw, oursRaw) = (m.group(3).toLong, m.group(4).toLong)
    val raw = m.group(5).toLong
    info(f"content-for-content: ZDICT $zdRaw%d (${zdRaw.toDouble / raw}%.4f)" +
      f" vs OURS $oursRaw%d (${oursRaw.toDouble / raw}%.4f) = " +
      f"${oursRaw.toDouble / zdRaw}%.3fx")
    info(f"full blobs (ZDICT + its entropy tables): ZDICT $zd%d vs " +
      f"OURS $ours%d = ${ours.toDouble / zd}%.3fx")
    assert(oursRaw.toDouble <= 1.25 * zdRaw.toDouble,
      f"trained content ${oursRaw.toDouble / zdRaw}%.3fx of ZDICT content " +
        "— over the 1.25x bar")
  }

  private def pythonBin(): String = {
    val cands = Seq("/usr/bin/python3", "/root/.pyenv/versions/3.11.7/bin/python3")
    cands.find(p => new java.io.File(p).exists()).getOrElse("")
  }
}
