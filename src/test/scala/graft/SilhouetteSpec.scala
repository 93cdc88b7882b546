package graft

import graft.operators.{Ann, Silhouette}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SilhouetteSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  private def cents(rows: (Long, Array[Float])*) =
    rows.toSeq.toDF("cent_id", "c_emb")
      .withColumn("c_nrm", Ann.norm(col("c_emb")))

  test("orthogonal tight clusters score 1; a duplicated centroid scores 0 by the guard") {
    val e1 = Array(1f, 0f, 0f); val e2 = Array(0f, 1f, 0f)
    val vecs = Seq((1L, e1), (2L, e1), (3L, e2)).toDF("vec_id", "embedding")
    // clean: two orthogonal centroids, every point exactly on its ray
    val clean = Silhouette.silhouette(vecs, cents(10L -> e1, 20L -> e2))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(clean == Map(10L -> 1.0, 20L -> 1.0))
    // degenerate: the same centroid twice — a = b = 0 must hit the
    // s = 0 convention, never 0/0
    val dup = Silhouette.silhouette(vecs.filter(col("vec_id") <= 2),
      cents(10L -> e1, 11L -> e1)).collect()
    assert(dup.length == 1 && dup.head.getLong(0) == 10L)
    assert(dup.head.getDouble(3) == 0.0)
  }

  test("a point midway between centroids drags its cluster mean down") {
    val mid = Array(1f, 1f, 0f)
    val vecs = Seq((1L, Array(1f, 0f, 0f)), (2L, mid))
      .toDF("vec_id", "embedding")
    val out = Silhouette.silhouette(vecs,
      cents(10L -> Array(1f, 0f, 0f), 20L -> Array(0f, 1f, 0f)))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    // the midway point ties to cluster 10 (lowest id) with sim1 = sim2
    // = cos 45° < 1 → s = 0 for it; cluster mean = (1 + 0)/2
    assert(out(10L) == ((2L, 0.5)))
  }

  test("sequential micro-unit recompute parity on the embeddings corpus") {
    val got = Silhouette.silhouetteQuery(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))).toMap

    val all = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val cs = all.filter(_._1 % 25 == 0)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def nrm(a: Array[Float]) = math.sqrt(dot(a, a))
    val acc = scala.collection.mutable.Map.empty[Long, (Long, Long, Long, Long)]
    for ((_, v) <- all) {
      val sims = cs.map { case (cid, c) =>
        (r6(dot(v, c) / (nrm(v) * nrm(c))), cid)
      }.sortBy { case (s, cid) => (-s, cid) }
      val (s1, c1) = sims(0)
      val (s2, _) = sims(1)
      val sil = if (s2 < 1.0) (s1 - s2) / (1.0 - s2) else 0.0
      val simM = math.floor(s1 * 1e6 + 0.5).toLong
      val silM = math.floor(sil * 1e6 + 0.5).toLong
      val (n, ss, sl, mn) = acc.getOrElse(c1, (0L, 0L, 0L, Long.MaxValue))
      acc(c1) = (n + 1, ss + simM, sl + silM, math.min(mn, silM))
    }
    assert(got.keySet == acc.keySet)
    for ((cid, (n, ss, sl, mn)) <- acc) {
      val (gn, gsim, gsil, gmin) = got(cid)
      assert(gn == n, cid)
      assert(gsim == r6(ss.toDouble / (n.toDouble * 1e6)), cid)
      assert(gsil == r6(sl.toDouble / (n.toDouble * 1e6)), cid)
      assert(gmin == r6(mn.toDouble / 1e6), cid)
    }
  }
}
