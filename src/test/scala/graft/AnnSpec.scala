package graft

import graft.operators.{Ann, KMeansVec}
import graft.sources.{MediaExtract, MediaTransforms}
import org.scalatest.funsuite.AnyFunSuite

class AnnSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("kmeans fit is deterministic and returns k centroids") {
    val vecs = Tables.embeddings(spark, sf)
    val c1 = KMeansVec.fit(vecs, 8, 2)
      .select("cent_id", "c_emb").as[(Long, Array[Float])].collect()
      .sortBy(_._1)
    val c2 = KMeansVec.fit(vecs, 8, 2)
      .select("cent_id", "c_emb").as[(Long, Array[Float])].collect()
      .sortBy(_._1)
    assert(c1.length == 8)
    assert(c1.map(_._1).sameElements(c2.map(_._1)))
    c1.zip(c2).foreach { case ((_, a), (_, b)) => assert(a.sameElements(b)) }
  }

  test("kmeans assignment covers every vector exactly once") {
    val vecs = Tables.embeddings(spark, sf)
    val cents = KMeansVec.fit(vecs, 8, 2)
    val e = vecs.selectExpr("vec_id", "embedding")
      .withColumn("nrm", Ann.norm(org.apache.spark.sql.functions.col("embedding")))
    val assigned = KMeansVec.assign(e, cents)
    assert(assigned.count() == vecs.count())
    assert(assigned.select("vec_id").distinct().count() == vecs.count())
  }

  test("trained IVF achieves decent recall vs brute force") {
    val brute = Ann.bruteForce(spark, sf)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivf = Ann.ivfTrained(spark, sf, k = 8, iters = 2)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty)
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall@${Ann.TopK} = $recall too low")
  }

  test("media transforms: meta, resize, frames, features are deterministic") {
    val ds = MediaExtract.fromDocuments(spark, sf).limit(40)
    val meta = MediaTransforms.decodeMeta(ds).collect()
    assert(meta.length == 40)
    assert(meta.forall(m => m.width >= 16 && m.height >= 16 && m.n_frames >= 1))

    val resized = MediaTransforms.resize(ds, maxSide = 64).collect()
    assert(resized.forall(r => r.width <= 64 && r.height <= 64 &&
      r.width >= 1 && r.height >= 1))

    val frames = MediaTransforms.sampleFrames(ds, stride = 4)
    val byDoc = frames.groupByKey(_.doc_id).count().collect().toMap
    val expected = meta.map(m => m.doc_id ->
      (0 until m.n_frames by 4).size.toLong).toMap
    assert(byDoc == expected)

    val f1 = MediaTransforms.extractFeatures(ds).collect()
      .map(f => f.doc_id -> f.feature.toSeq).toMap
    val f2 = MediaTransforms.extractFeatures(ds).collect()
      .map(f => f.doc_id -> f.feature.toSeq).toMap
    assert(f1 == f2)
    assert(f1.values.forall(v => v.length == MediaTransforms.FeatureDim &&
      v.forall(x => x >= 0f && x < 1f)))
  }
}
