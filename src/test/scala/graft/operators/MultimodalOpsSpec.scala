package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("asset table: binary payload round-trips the source text bytes") {
    val a = MultimodalOps.assets(spark, sf)
    val bad = a.withColumn("rt", decode(col("payload"), "UTF-8"))
      .join(graft.Tables.documents(spark, sf),
        col("asset_id") === col("doc_id"))
      .filter(col("rt") =!= col("text"))
    assert(bad.isEmpty)
    assert(a.select("media_type").distinct().count() == 3)
  }

  test("feature extraction: normalized 16-bin histogram, deterministic") {
    val feats = MultimodalOps.extractFeatures(spark, MultimodalOps.assets(spark, sf))
      .collect()
    assert(feats.length == 500)
    feats.foreach { f =>
      assert(f.features.length == 16)
      assert(math.abs(f.features.sum - 1.0f) < 1e-3, s"histogram not normalized: ${f.features.sum}")
    }
    // deterministic across invocations
    val again = MultimodalOps.extractFeatures(spark, MultimodalOps.assets(spark, sf))
      .collect().map(f => f.asset_id -> f.features.toSeq).toMap
    assert(feats.forall(f => again(f.asset_id) == f.features.toSeq))
  }

  test("features compose with cosine similarity search") {
    import spark.implicits._
    val feats = MultimodalOps.extractFeatures(spark, MultimodalOps.assets(spark, sf))
      .limit(20)
      .map(f => (f.asset_id, f.features.map(_.toDouble).toSeq))
      .toDF("vec_id", "v")
    val q = feats.select(col("vec_id").as("query_id"), col("v").as("qv")).limit(2)
    val top = SimilarityOps.bruteForceTopK(feats, q, 3)
    assert(top.count() == 6)
  }

  test("resize shrinks payload proportionally and rewrites metadata") {
    val a = MultimodalOps.assets(spark, sf)
    val r = MultimodalOps.resize(a, 16, 16)
    val bad = r.filter(col("width") =!= 16 || col("height") =!= 16)
    assert(bad.isEmpty)
    val shrunk = r.select(sum(octet_length(col("payload")))).head.getLong(0)
    val orig = a.select(sum(octet_length(col("payload")))).head.getLong(0)
    assert(shrunk < orig)
  }

  test("frame sampling reassembles to the original payload") {
    import spark.implicits._
    val a = MultimodalOps.assets(spark, sf)
    val frames = MultimodalOps.sampleFrames(a, 4)
      .orderBy("asset_id", "frame_idx")
      .select(col("asset_id"), col("frame_bytes"))
      .as[(Long, Array[Byte])]
      .collect()
      .groupBy(_._1).map { case (id, fs) => id -> fs.flatMap(_._2) }
    val originals = a.filter(col("media_type") === "video")
      .select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])].collect().toMap
    assert(frames.keySet == originals.keySet)
    frames.foreach { case (id, bytes) =>
      assert(bytes.sameElements(originals(id)), s"asset $id frames != payload")
    }
  }
}
