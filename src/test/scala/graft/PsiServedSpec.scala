package graft

import graft.operators.Psi
import org.scalatest.funsuite.AnyFunSuite

class PsiServedSpec extends AnyFunSuite {
  import SparkTestSession._

  test("served verdict cross-validates against the exact detector per type") {
    val exact = Psi.psiQuery(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val served = Psi.psiServed(spark, sf).collect()
    assert(served.nonEmpty)
    served.foreach { r =>
      val t = r.getString(0)
      val e = exact(t)
      // exact arm counts ride the served row untouched by sampling
      assert(r.getAs[Long]("n_ref") == e.getAs[Long]("n_ref"), s"$t n_ref")
      assert(r.getAs[Long]("n_cur") == e.getAs[Long]("n_cur"), s"$t n_cur")
      // the sample is capped at K per arm
      assert(r.getAs[Long]("m_ref") <= graft.operators.Kmv.K.toLong)
      assert(r.getAs[Long]("m_cur") <= graft.operators.Kmv.K.toLong)
      // cross-validation (the q_lift discipline): the served verdict
      // agrees with the exact one on the fixture — sampling noise at
      // K=128 does not cross the folklore bands here
      assert(r.getAs[String]("verdict_est") == e.getAs[String]("verdict"),
        s"$t verdict")
      // and the estimate sits within a loose PSI band implied by the
      // DKW CDF stamp (each decile mass off by <= 2(eps1+eps2))
      val eps = r.getAs[Double]("eps_cdf")
      val diff = math.abs(r.getAs[Long]("psi_micro_est") -
        e.getAs[Long]("psi_micro")) / 1e6
      assert(diff <= 8 * eps, s"$t psi deviation $diff vs eps $eps")
    }
  }

  test("small arms: sample IS the arm, estimate equals the exact PSI") {
    // when both arms fit under K the bottom-k sample keeps everything
    // and the served fold must reproduce the exact statistic verbatim
    val exact = Psi.psiQuery(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getString(0) -> r).toMap
    Psi.psiServed(spark, "/root/testdata/sf0.001").collect().foreach { r =>
      val t = r.getString(0)
      if (r.getAs[Long]("n_ref") <= graft.operators.Kmv.K &&
        r.getAs[Long]("n_cur") <= graft.operators.Kmv.K) {
        assert(r.getAs[Long]("m_ref") == r.getAs[Long]("n_ref"))
        assert(r.getAs[Long]("psi_micro_est") ==
          exact(t).getAs[Long]("psi_micro"), s"$t exact-sample parity")
      }
    }
  }
}
