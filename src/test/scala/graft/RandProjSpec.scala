package graft

import graft.operators.RandProj
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RandProjSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private lazy val vecs = Tables.embeddings(spark, sf).limit(64).cache()

  test("projection matches the sequential signed-dot reference bit-for-bit") {
    val got = RandProj.projectFlat(vecs)
      .as[(Long, Long, Long)].collect()
      .map { case (id, j, p) => (id, j) -> p }.toMap
    val rows = vecs.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    assert(rows.nonEmpty && got.nonEmpty)
    rows.foreach { case (id, emb) =>
      val vm = emb.map(v => math.floor(v.toDouble * 1e6 + 0.5).toLong)
      (0 until RandProj.D).foreach { j =>
        val want = vm.indices.map(i => vm(i) * RandProj.sign(i, j)).sum
        assert(got((id, j.toLong)) == want, s"vec $id dim $j")
      }
    }
  }

  test("sign derivation equals the oracle's md5-nibble rule") {
    // the SQL mirror reads parity off the first hex char of
    // md5("rp:i:j"); the driver-side matrix must agree exactly
    val md = java.security.MessageDigest.getInstance("MD5")
    for (i <- 0 until 16; j <- 0 until RandProj.D) {
      val hex = md.digest(s"rp:$i:$j".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val want = if (Integer.parseInt(hex.substring(0, 1), 16) % 2 == 0) 1L else -1L
      assert(RandProj.sign(i, j) == want, s"($i,$j)")
    }
  }

  test("projection is scan-shaped: no Exchange before the explode") {
    val plan = RandProj.projectFlat(Tables.embeddings(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"signed projection must ride the scan:\n$plan")
  }

  test("projectedVectors is scan-shaped too, and an empty frame is an empty result") {
    val plan = RandProj.projectedVectors(Tables.embeddings(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"the library face must not explode-and-reassemble:\n$plan")
    val empty = Tables.embeddings(spark, sf).filter(col("vec_id") < 0)
    assert(RandProj.projectFlat(empty).count() == 0)
    assert(RandProj.projectedVectors(empty).count() == 0)
  }

  test("projectedVectors reassembles D-dim float vectors preserving dot structure") {
    val out = RandProj.projectedVectors(vecs)
      .as[(Long, Seq[Float])].collect().toMap
    assert(out.nonEmpty)
    assert(out.values.forall(_.size == RandProj.D))
    // JL sanity on real data: the reduced space must keep exact-dup
    // vectors identical and distinct vectors distinct (a weaker but
    // deterministic form of distance preservation)
    val flat = RandProj.projectFlat(vecs)
      .as[(Long, Long, Long)].collect().groupBy(_._1)
      .map { case (id, rs) => id -> rs.sortBy(_._2).map(_._3).toSeq }
    flat.foreach { case (id, ps) =>
      val f = out(id)
      ps.zipWithIndex.foreach { case (p, j) =>
        assert(f(j) == (p.toDouble / 1e6).toFloat, s"vec $id dim $j")
      }
    }
  }
}
