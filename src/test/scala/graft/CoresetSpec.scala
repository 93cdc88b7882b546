package graft

import graft.operators.Coreset
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CoresetSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

  /** Sequential Gonzalez reference on driver-side vectors. */
  private def seqGonzalez(vs: Seq[(Long, Array[Float])], k: Int): Seq[(Long, Double)] = {
    def nrm(a: Array[Float]) = math.sqrt(a.map(x => x.toDouble * x).sum)
    def cos(a: Array[Float], b: Array[Float]) = {
      var d = 0.0; var i = 0
      while (i < a.length) { d += a(i).toDouble * b(i).toDouble; i += 1 }
      r6(d / (nrm(a) * nrm(b)))
    }
    val seed = vs.minBy(_._1)
    var centers = Vector(seed)
    var picks = Vector((seed._1, 0.0))
    while (picks.size < k) {
      val best = vs.map { case (id, v) =>
        (id, centers.map(c => 1.0 - cos(v, c._2)).min)
      }.maxBy { case (id, d) => (d, -id) }
      centers :+= vs.find(_._1 == best._1).get
      picks :+= best
    }
    picks
  }

  test("distributed picks match the sequential Gonzalez reference exactly") {
    val vs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    val want = seqGonzalez(vs, Coreset.K)
    val got = Coreset.coreset(spark, sf)
      .orderBy(col("round"))
      .select(col("vec_id"), col("d_min"))
      .as[(Long, Double)].collect().toSeq
    assert(got == want)
  }

  test("pick distances are non-increasing (greedy cover shrinks the frontier)") {
    val ds = Coreset.coreset(spark, sf).orderBy(col("round"))
      .select(col("d_min")).as[Double].collect().drop(1)
    assert(ds.zip(ds.tail).forall { case (a, b) => b <= a }, ds.toSeq)
  }

  test("round k+1's pick distance is the covering radius of the first k centers") {
    val emb = Tables.embeddings(spark, sf)
    val k = 4
    val picks = Coreset.kCenters(emb, k + 1)
      .orderBy(col("round")).select(col("vec_id"), col("d_min"))
      .as[(Long, Double)].collect()
    val centerIds = picks.take(k).map(_._1).toSet
    val vs = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    val centers = vs.filter(v => centerIds(v._1))
    def nrm(a: Array[Float]) = math.sqrt(a.map(x => x.toDouble * x).sum)
    def cos(a: Array[Float], b: Array[Float]) = {
      var d = 0.0; var i = 0
      while (i < a.length) { d += a(i).toDouble * b(i).toDouble; i += 1 }
      r6(d / (nrm(a) * nrm(b)))
    }
    val radius = vs.map { case (_, v) =>
      centers.map(c => 1.0 - cos(v, c._2)).min
    }.max
    assert(picks(k)._2 == radius)
  }
}
