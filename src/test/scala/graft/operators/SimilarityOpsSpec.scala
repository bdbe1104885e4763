package graft.operators

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilarityOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("cosine agrees with a hand computation") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 0.0, 1.0), Seq(1.0, 1.0, 0.0))).toDF("a", "b")
    val c = df.select(SimilarityOps.cosine(col("a"), col("b"))).head.getDouble(0)
    assert(math.abs(c - 0.5) < 1e-12)
  }

  test("LSH ANN recall@10 >= 0.9 vs brute force on sf0.001") {
    val brute = SimilarityOps.q23AnnTopK(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val lsh = SimilarityOps.q24AnnLsh(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(brute.nonEmpty)
    val recall = (brute intersect lsh).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall@10 = $recall")
  }

  test("LSH candidate generation is a bucket equi-join (no cartesian)") {
    val plan = SimilarityOps.q24AnnLsh(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("cosine near-dup LSH == exact pairs at the oracle threshold, no cartesian") {
    import org.apache.spark.sql.functions.col
    val c = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val exact = SimilarityOps.cosineNearDup(c, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the REGISTERED parameterization (margin-sized tables): this equality
    // is the per-scale-factor recall contract from Q28Tables' scaladoc
    val lsh = SimilarityOps.cosineNearDupLsh(c, 0.4, tables = SimilarityOps.Q28Tables)
    val got = lsh.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    // q28 registers the LSH path against an exact all-pairs oracle, so
    // measured recall must be exactly 1.0 (and verification is exact, so
    // no false pairs either)
    assert(got == exact,
      s"missing=${(exact -- got).take(5)} extra=${(got -- exact).take(5)}")
    val plan = lsh.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("registered q28 runs the bucket-join plan (no BNLJ/cartesian)") {
    val plan = graft.SparkEntry.queries("q28_cosine_neardup")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("candidate-volume guard: defaults stay within the measured frontier") {
    import org.apache.spark.sql.functions.col
    val c = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val n = c.count()
    val brute = n * (n - 1) / 2
    val cand = SimilarityOps.srpCandidateStats(c, tables = 24, bitsPerTable = 3)
    // on this structureless corpus the recall-1.0 frontier measures ~3x
    // brute work (see srpBitsFor scaladoc); the guard catches regressions
    // to parameters that generate even more
    assert(cand.workRows <= 4 * brute, s"candidates=$cand brute=$brute")
    // the registered q28 doubles the tables as oracle safety margin — its
    // work must scale linearly in tables (same per-table bucket shape),
    // not blow past it
    val cand48 = SimilarityOps.srpCandidateStats(
      c, tables = SimilarityOps.Q28Tables, bitsPerTable = 3)
    assert(cand48.workRows <= 8 * brute, s"candidates=$cand48 brute=$brute")
  }

  test("clustered corpus: corpus-sized bits give subquadratic candidates at full recall") {
    import spark.implicits._
    // 20 tight clusters x 50 points: within-cluster cosine ~0.99 (the
    // regime real near-dup corpora live in), cross-cluster ~uniform
    val rnd = new scala.util.Random(42)
    val centers = Array.fill(20)(Array.fill(64)(rnd.nextGaussian()))
    val rows = for {
      cl <- 0 until 20; i <- 0 until 50
    } yield {
      val v = centers(cl).map(x => x + rnd.nextGaussian() * 0.05)
      (cl.toLong * 50 + i, v.toSeq)
    }
    val c = rows.toDF("vec_id", "v")
    val n = rows.size.toLong
    val brute = n * (n - 1) / 2
    // target bucket ~ the dup-group scale, not the cluster scale: near-dup
    // verification only needs dup candidates co-bucketed
    val bits = SimilarityOps.srpBitsFor(n, targetBucketSize = 2)
    val cand = SimilarityOps.srpCandidateStats(c, tables = 8, bitsPerTable = bits)
    assert(cand.distinctPairs < brute / 4,
      s"candidates=$cand brute=$brute bits=$bits")
    assert(cand.workRows < brute,
      s"work exceeded brute force on clustered data: $cand vs $brute")
    val exact = SimilarityOps.cosineNearDup(c, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = SimilarityOps.cosineNearDupLsh(c, 0.9, tables = 8, bitsPerTable = bits)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(got == exact,
      s"clustered recall broke: missing=${(exact -- got).take(5)} extra=${(got -- exact).take(5)}")
  }

  test("clustered corpus: SRP top-k prunes subquadratically at recall@10 >= 0.9") {
    import spark.implicits._
    // the q24 operator's pruning proof, mirroring the IVF probe-fraction
    // test: on clustered data (where ANN pruning is information-
    // theoretically possible) corpus-scaled bits must give BOTH
    // subquadratic candidate volume AND high top-k recall — the near-dup
    // pair form already has this proof; this is the top-k form's
    val rnd = new scala.util.Random(45)
    val centers = Array.fill(20)(Array.fill(64)(rnd.nextGaussian()))
    val rows = for {
      cl <- 0 until 20; i <- 0 until 50
    } yield {
      val v = centers(cl).map(x => x + rnd.nextGaussian() * 0.05)
      (cl.toLong * 50 + i, v.toSeq)
    }
    val c = rows.toDF("vec_id", "v")
    val q = c.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val n = rows.size.toLong
    val nQ = q.count()
    val brute = nQ * n // one cosine per (query, corpus) pair
    // target bucket ~ the dup-group scale (same sizing rule as the
    // clustered near-dup proof): tight clusters stay bucket-coherent under
    // many planes, so selectivity prunes strangers without splitting the
    // true neighbors
    val bits = SimilarityOps.srpBitsFor(n, targetBucketSize = 8)
    val cand = SimilarityOps.srpTopKCandidateStats(c, q, tables = 8, bitsPerTable = bits)
    assert(cand.workRows < brute,
      s"top-k candidate work exceeded brute force: $cand vs brute=$brute (bits=$bits)")
    assert(cand.distinctPairs < brute / 4,
      s"top-k distinct candidates not pruned: $cand vs brute=$brute")
    val exact = SimilarityOps.bruteForceTopK(c, q, 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val lsh = SimilarityOps.annTopKLsh(c, q, 10, tables = 8, bitsPerTable = bits)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(lsh.size == exact.size, "LSH returned a short top-k list")
    assert(exact.nonEmpty)
    val recall = (exact intersect lsh).size.toDouble / exact.size
    assert(recall >= 0.9, s"clustered SRP top-k recall@10 = $recall (bits=$bits)")
  }

  test("IVF ANN recall@10 >= 0.9 vs brute force on sf0.001") {
    val c = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = c.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val brute = SimilarityOps.q23AnnTopK(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = SimilarityOps.annTopKIvf(c, q, 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(brute.nonEmpty)
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.9, s"IVF recall@10 = $recall")
  }

  test("registered q32 parity legs all pin to 10 and the plan has no cartesian/BNLJ") {
    val df = SimilarityOps.q32AnnIvf(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    for (r <- rows; i <- 1 to 3)
      assert(r.getLong(i) == 10,
        s"IVF parity divergence at query ${r.getLong(0)}: $r")
    // centroids are literal arrays after driver-side training, so the
    // whole assign/probe path is codegen projections: the ONLY joins in
    // the plan are the cid equi-join against the inverted file and the
    // count/agreement equi-joins
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("clustered corpus: IVF probes a corpus fraction at full recall") {
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    val centers = Array.fill(20)(Array.fill(64)(rnd.nextGaussian()))
    val rows = for {
      cl <- 0 until 20; i <- 0 until 50
    } yield {
      val v = centers(cl).map(x => x + rnd.nextGaussian() * 0.05)
      (cl.toLong * 50 + i, v.toSeq)
    }
    val c = rows.toDF("vec_id", "v")
    val q = c.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    // nprobe=2 of 20 clusters: only ~10% of the corpus is scanned per
    // query — the pruning regime IVF exists for — and on tightly
    // clustered data the true neighbors live in the probed clusters
    val brute = SimilarityOps.bruteForceTopK(c, q, 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = SimilarityOps.annTopKIvf(c, q, 10, nClusters = 20, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(brute.nonEmpty)
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.95, s"clustered IVF recall@10 = $recall")
    // sample-trained quantizer (1/4 of the corpus): the 100 TB index-build
    // shape. Tight clusters survive sampling, so recall must hold.
    val sampled = SimilarityOps.annTopKIvf(c, q, 10, nClusters = 20, nprobe = 2,
      trainSampleMod = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recallS = (brute intersect sampled).size.toDouble / brute.size
    assert(recallS >= 0.95, s"sample-trained IVF recall@10 = $recallS")
  }

  test("every query returns a full, deduplicated top-10") {
    val out = SimilarityOps.q23AnnTopK(spark, sf)
    val byQuery = out.groupBy("query_id")
      .agg(count(lit(1)).as("n"), countDistinct(col("vec_id")).as("nd"))
      .filter(col("n") =!= 10 || col("nd") =!= 10)
    assert(byQuery.isEmpty, byQuery.collect().mkString(", "))
    val nQueries = Tables.embeddings(spark, sf).filter(col("vec_id") % 50 === 0).count()
    assert(out.count() == nQueries * 10)
  }

  private def vecs = Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  test("int8 quantization: codes bounded, full-range scale hit, half-step reconstruction") {
    val qc = SimilarityOps.quantizeInt8(vecs, "v")
    val codeMax = qc.select(array_max(transform(col("qv"), x => abs(x))).as("m"))
    // every code within the int8 symmetric range
    assert(codeMax.agg(max(col("m"))).head.getInt(0) <= 127)
    // the scale-defining element always quantizes to exactly +-127 —
    // the full range is used on every vector (that's what per-vector
    // symmetric scaling buys over a global scale)
    assert(codeMax.agg(min(col("m"))).head.getInt(0) == 127)
    // dequantized codes sit within half a quantization step of the input
    val relErr = qc.select(
      (aggregate(
        zip_with(col("qv"), col("v"),
          (q, x) => abs(q.cast("double") * col("qscale") / lit(127.0) - x)),
        lit(0.0), (a, e) => greatest(a, e)) / col("qscale")).as("e"))
      .agg(max(col("e"))).head.getDouble(0)
    assert(relErr <= 0.5 / 127 + 1e-12, s"max relative reconstruction error $relErr")
    // qs2 is the exact integer sum of squared codes
    val qs2Bad = qc.select(
      (col("qs2") - aggregate(col("qv"), lit(0L),
        (a, x) => a + x.cast("long") * x.cast("long"))).as("d"))
      .filter(col("d") =!= 0L).count()
    assert(qs2Bad == 0L)
  }

  test("quantized top-k tracks the exact ranking (recall) and is deterministic") {
    val exact = SimilarityOps.q23AnnTopK(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val quant = SimilarityOps.q62QuantizedTopK(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(exact.nonEmpty)
    // int8 keeps ~2 decimal digits of each coordinate; on this corpus the
    // top-10 under quantized cosine stays close to the float ranking —
    // the compression/recall trade a real SQ8 index makes
    val recall = (exact intersect quant).size.toDouble / exact.size
    assert(recall >= 0.85, s"quantized recall@10 = $recall")
    val again = SimilarityOps.q62QuantizedTopK(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(quant == again)
  }

  test("q62 plan: bounded top-k aggregate, no window sort of scored pairs") {
    val plan = SimilarityOps.q62QuantizedTopK(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("q109 TF-IDF cosine: bounds hold and identical shingle sets score 1.0") {
    val out = SimilarityOps.q109TfidfCosine(spark, sf).cache()
    try {
      assert(out.count() > 0, "no candidate pairs (vacuous)")
      // cosine of non-negative vectors with shared support: (0, 1]
      val bad = out.where(col("cos_sim") <= 0.0 || col("cos_sim") > 1.0)
      assert(bad.isEmpty, "cosine out of (0, 1]")
      // cross-model agreement: every MinHash-flagged near-dup pair (q20)
      // must surface here too, scoring near 1 — the two models see the
      // same planted duplicates through different algebra
      val mh = DedupOps.minhashNearDup(graft.Tables.documents(spark, sf))
        .select(col("doc_a"), col("doc_b"))
      assert(mh.count() > 0, "no MinHash near-dups (vacuous)")
      val joined = mh.join(out, Seq("doc_a", "doc_b"))
      assert(joined.count() == mh.count(),
        "a MinHash near-dup pair is missing from the TF-IDF candidates")
      // deterministic min on this corpus is ~0.769 (idf weighting skews
      // below raw Jaccard when the divergent shingles are the rare ones)
      assert(joined.agg(min(col("cos_sim"))).head.getDouble(0) > 0.7,
        "MinHash near-dups should score high under TF-IDF cosine")
    } finally { out.unpersist(); () }
  }
}
