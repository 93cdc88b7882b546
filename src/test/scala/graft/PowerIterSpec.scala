package graft

import graft.operators.{Pca, PowerIter}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PowerIterSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** Planted-direction corpus: x = a·u + small index jitter, so
    * λ₁ ≫ λ₂ and eight rounds must converge.
    */
  private def planted = {
    val d = Pca.Dim
    val u = Array.tabulate(d)(i => math.sin(i + 1.0))
    val un = math.sqrt(u.map(x => x * x).sum)
    val dirs = (1 to 200).map { k =>
      val a = (k % 7).toDouble - 3.0 // spread along u
      Array.tabulate(d)(i =>
        (a * u(i) / un + 0.001 * ((k * 31 + i) % 11 - 5)).toFloat).toSeq
    }
    dirs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
  }

  test("eight integer rounds recover the Jacobi eigenvector on anisotropic data") {
    val emb = planted
    val b = Pca.moments(emb)
    val rows = PowerIter.powerIterFromMoments(spark, b)
      .collect().sortBy(_.getLong(0))
    val v = rows.map(_.getLong(1).toDouble)
    val model = Pca.fitFromMoments(b, 1)
    val e = model.components(0)
    val dot = v.zip(e).map { case (a, c) => a * c }.sum
    val cos = math.abs(dot) /
      (math.sqrt(v.map(x => x * x).sum) * math.sqrt(e.map(x => x * x).sum))
    assert(cos > 0.999,
      f"power-iteration direction misaligned with Jacobi: |cos|=$cos%.6f")
    val share = rows.head.getLong(2) / 1e6
    val evShare = model.eigvals.max / model.eigvals.sum
    assert(math.abs(share - evShare) < 0.005,
      f"share $share%.6f vs eigenvalue share $evShare%.6f")
    assert(share > 0.9, "the planted direction dominates the trace")
  }

  test("on the near-degenerate corpus the share is a bounded Rayleigh lower bound") {
    val rows = PowerIter.powerIter(spark, sf).collect()
    val shares = rows.map(_.getLong(2)).distinct
    assert(shares.length == 1, "one share, stamped on every row")
    assert(shares.head >= 1000000L / Pca.Dim,
      "the Rayleigh quotient of any vector is at least the average eigenvalue")
    val model = Pca.fit(Tables.embeddings(spark, sf), 1)
    val evShare = model.eigvals.max / model.eigvals.sum
    assert(shares.head <= (evShare * 1e6).toLong + 1,
      "a Rayleigh quotient can never exceed the top eigenvalue")
    // determinism: two runs agree bit for bit
    val again = PowerIter.powerIter(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    rows.foreach(r => assert(again(r.getLong(0)) == r.getLong(1)))
    // the milli lattice saturates at the dominant component
    assert(rows.map(_.getLong(1)).map(math.abs).max == 1000L)
  }
}
