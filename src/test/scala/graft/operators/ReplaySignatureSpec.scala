package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The portable-hash signature twins (q65 minhash / q66 simhash / q67
  * winnowing) value-checked against an independent reimplementation on
  * hand-built corpora: the md5-based selection algebra is recomputed here
  * with java.security.MessageDigest + plain Scala collections, the same
  * way the DuckDB oracle recomputes it with SQL. Pinning both ends means
  * a regression in the Spark HOF/aggregate plumbing cannot hide behind a
  * matching regression in the oracle text.
  */
class ReplaySignatureSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def shingles3(text: String): Set[String] = {
    val w = text.toLowerCase.split(" ", -1)
    if (w.length < 3) Set.empty
    else (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
  }

  test("q65 minhash: signature mins, digest and band keys match a scalar recompute") {
    import spark.implicits._
    val text = "alpha beta gamma delta epsilon zeta"
    val docs = Seq((1L, text), (2L, text), (3L, "too short")).toDF("doc_id", "text")
    val sh = docs.select(col("doc_id"), explode(DedupOps.shingles(col("text"))).as("s"))
    val mins = (0 until 12).map(i =>
      min(md5(concat(lit(s"$i:"), col("s")).cast("binary"))).as(s"m$i"))
    val sigs = sh.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
      .orderBy("doc_id").collect()
    // doc 3 has two words -> zero shingles -> absent
    assert(sigs.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    val expected = (0 until 12).map(i => shingles3(text).map(s => md5hex(s"$i:$s")).min)
    for (r <- sigs; i <- 0 until 12)
      assert(r.getString(i + 1) == expected(i), s"perm $i")
  }

  test("native Md5MinHash == the explode/groupBy aggregate form on real data") {
    val docs = graft.Tables.documents(spark, sf)
    val native = docs
      .select(col("doc_id"),
        graft.functions.Md5MinHash(DedupOps.shingles(col("text")), 12).as("sig"))
      .filter(col("sig").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    val sh = docs.select(col("doc_id"), explode(DedupOps.shingles(col("text"))).as("s"))
    val mins = (0 until 12).map(i =>
      min(md5(concat(lit(s"$i:"), col("s")).cast("binary"))).as(s"m$i"))
    val agg = sh.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to 12).map(r.getString).toSeq).toMap
    assert(native.keySet == agg.keySet)
    for ((id, sig) <- native) assert(sig == agg(id), s"doc $id signature diverged")
  }

  test("q65 on real data: exact-duplicate texts share all four band keys") {
    val out = DedupOps.q65MinhashReplay(spark, sf)
    // doc_id is unique; equal texts (q18 shows n_copies>1 groups exist) must
    // collapse to identical signatures. Weaker but data-independent pin:
    // rerun == rerun (determinism) and every digest is a 32-hex string.
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => (1 to 5).forall(i => r.getString(i).matches("[0-9a-f]{32}"))))
    val again = DedupOps.q65MinhashReplay(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("q66 simhash: single-feature doc's fingerprint IS its md5's low bits") {
    import spark.implicits._
    // exactly one shingle -> every bit vote is +-1 -> fingerprint bits equal
    // the feature hash bits (vote +1 -> 1, vote -1 -> 0)
    val docs = Seq((7L, "alpha beta gamma")).toDF("doc_id", "text")
    val h = md5hex("alpha beta gamma")
    val expected = (0 until 32).map { b =>
      val v = "0123456789abcdef".indexOf(h.charAt(b / 4))
      if (((v >> (b % 4)) & 1) == 1) 1L << b else 0L
    }.sum
    val sh = docs.select(col("doc_id"), explode(DedupOps.shingles(col("text"))).as("s"))
      .select(col("doc_id"), md5(col("s").cast("binary")).as("h"))
    val votes = (0 until 32).map { b =>
      sum(when(expr(
        s"(shiftright(instr('0123456789abcdef', substr(h, ${b / 4 + 1}, 1)) - 1, ${b % 4}) & 1) = 1"),
        lit(1L)).otherwise(lit(-1L))).as(s"v$b")
    }
    val agg = sh.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
    val fp = agg.select((0 until 32)
        .map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
        .reduce(_ + _).cast("long").as("simhash32"))
      .collect().head.getLong(0)
    assert(fp == expected, f"got $fp%08x want $expected%08x for md5 $h")
  }

  test("q66 on real data: fingerprints stay in 32-bit range") {
    val out = DedupOps.q66SimhashReplay(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall { r =>
      val v = r.getLong(2); v >= 0L && v < (1L << 32)
    })
  }

  test("native Md5SimHash == the hex-arithmetic aggregate form on real data") {
    val docs = graft.Tables.documents(spark, sf)
    val native = DedupOps.q66SimhashReplay(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val h = docs
      .select(col("doc_id"), explode(DedupOps.shingles(col("text"))).as("s"))
      .select(col("doc_id"), md5(col("s").cast("binary")).as("h"))
    val votes = (0 until 32).map { b =>
      sum(when(expr(
        s"(shiftright(instr('0123456789abcdef', substr(h, ${b / 4 + 1}, 1)) - 1, ${b % 4}) & 1) = 1"),
        lit(1L)).otherwise(lit(-1L))).as(s"v$b")
    }
    val aggs = count(lit(1)).cast("long").as("n_features") +: votes
    val agg = h.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
    val ref = agg.select(col("doc_id"), col("n_features"),
        (0 until 32).map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).cast("long").as("simhash32"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(native.keySet == ref.keySet)
    for ((id, v) <- native) assert(v == ref(id), s"doc $id diverged")
  }

  test("q67 winnowing: fingerprint set matches a scalar sliding-min recompute") {
    import spark.implicits._
    val text = "the quick brown fox jumps over the lazy dog"
    val docs = Seq((1L, text), (2L, "hi")).toDF("doc_id", "text")
    val out = docs
      .select(col("doc_id"), TextOps.md5WinnowFingerprint(col("text")).as("fp"))
      .orderBy("doc_id").collect()
    def winnow(t: String, k: Int = 5, w: Int = 4): Seq[String] = {
      val np = math.max(t.length - k, 0) + 1
      val hs = (1 to np).map(p => md5hex(t.substring(p - 1, math.min(p - 1 + k, t.length))))
      val nw = math.max(hs.length - w, 0) + 1
      (1 to nw).map(s => hs.slice(s - 1, s - 1 + w).min).distinct.sorted
    }
    assert(out(0).getSeq[String](1) == winnow(text))
    // 2-char doc: one position hashing the whole text, one window
    assert(out(1).getSeq[String](1) == Seq(md5hex("hi")))
  }

  test("q72 SRP buckets match a scalar recompute; scaled vectors share all buckets") {
    val rows = SimilarityOps.q72SrpReplay(spark, sf).collect()
    assert(rows.nonEmpty)
    val vecs = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def quant(v: Array[Double]): Array[Int] = {
      val qs = v.map(math.abs).max
      if (qs == 0) v.map(_ => 0)
      else v.map(x => math.round(x * 127.0 / qs).toInt)
    }
    def plane(p: Int): Array[Long] = Array.tabulate(64) { d =>
      (((p.toLong * 1000003L + d) % 1000000007L) * 2654435761L) % 10007L - 5003L
    }
    def buckets(v: Array[Double]): Seq[Long] = {
      val q = quant(v)
      (0 until 4).map { t =>
        (0 until 8).map { b =>
          val pl = plane(t * 8 + b)
          val dot = q.zip(pl).map { case (x, y) => x.toLong * y }.sum
          if (dot > 0) 1L << b else 0L
        }.sum
      }
    }
    for (r <- rows.take(50)) {
      val want = buckets(vecs(r.getLong(0)))
      val got = (1 to 4).map(r.getLong(_))
      assert(got == want, s"vec ${r.getLong(0)}: $got vs $want")
    }
    // SRP locality: quantization-scale invariance means a scaled copy of a
    // vector lands in the SAME bucket in every table
    val v0 = vecs(rows.head.getLong(0))
    assert(buckets(v0) == buckets(v0.map(_ * 3.7)))
  }

  test("native Md5Winnow == builtin HOF composition on real data (incl. edge lengths)") {
    import spark.implicits._
    val real = graft.Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val edge = Seq((900001L, ""), (900002L, "ab"), (900003L, "exact"),
      (900004L, "sixchr"), (900005L, "overlap overlap overlap"))
      .toDF("doc_id", "text")
    val docs = real.unionByName(edge)
    val both = docs.select(
      col("doc_id"),
      TextOps.md5WinnowFingerprint(col("text")).as("native"),
      TextOps.md5WinnowFingerprintBuiltins(col("text")).as("builtin"))
    val diff = both.filter(col("native") =!= col("builtin"))
    assert(diff.count() == 0,
      s"native/builtin diverged: ${diff.limit(3).collect().mkString(", ")}")
  }

  test("q67 digest equals md5 of the sorted concatenated fingerprints") {
    val r = TextOps.q67WinnowReplay(spark, sf).limit(3).collect()
    val fps = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), TextOps.md5WinnowFingerprint(col("text")).as("fp"))
      .orderBy("doc_id").limit(3).collect()
    for ((a, b) <- r.zip(fps)) {
      assert(a.getLong(0) == b.getLong(0))
      assert(a.getLong(1) == b.getSeq[String](1).size)
      assert(a.getString(2) == md5hex(b.getSeq[String](1).mkString("")))
    }
  }
}
