package graft

import graft.operators.{EmbedRank, Pca}
import org.scalatest.funsuite.AnyFunSuite

class EmbedRankSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val D = Pca.Dim

  private def frame(vecs: Seq[Array[Float]]) =
    vecs.map(v => Tuple1(v.toSeq)).toDF("embedding")

  private def axis(i: Int, s: Float): Array[Float] = {
    val v = new Array[Float](D); v(i) = s; v
  }

  private def report(vecs: Seq[Array[Float]]) = {
    val r = EmbedRank.embedRank(spark, frame(vecs)).collect().head
    (r.getAs[Long]("n_vecs"),
      Option(r.get(r.fieldIndex("eff_rank"))).map(_.asInstanceOf[Double]))
  }

  test("rank-1 collapse reads EXACTLY 1: all variance on one direction") {
    val vecs = (0 until 32).map(i => axis(0, if (i % 2 == 0) 0.5f else -0.5f))
    assert(report(vecs) == ((32L, Some(1.0))))
  }

  test("perfect k-axis isotropy reads exactly k") {
    // +-0.5 on each of 4 axes, balanced: C is diag with 4 equal
    // entries -> PR = (4a)^2 / (4a^2) = 4
    val vecs = for (i <- 0 until 4; s <- Seq(0.5f, -0.5f)) yield axis(i, s)
    assert(report(vecs) == ((8L, Some(4.0))))
    val vecs16 = for (i <- 0 until 16; s <- Seq(0.5f, -0.5f)) yield axis(i, s)
    assert(report(vecs16) == ((32L, Some(16.0))))
  }

  test("degenerate inputs refuse to fabricate a rank") {
    // zero variance: every vector identical
    val (n, pr) = report(Seq.fill(5)(axis(0, 0.7f)))
    assert(n == 5L && pr.isEmpty, "constant cloud has no rank")
    val (n1, pr1) = report(Seq(axis(0, 0.7f)))
    assert(n1 == 1L && pr1.isEmpty, "n < 2 has no covariance")
  }
}
