package graft

import graft.operators.Shapley
import org.scalatest.funsuite.AnyFunSuite

class ShapleySpec extends AnyFunSuite {
  import SparkTestSession._

  test("efficiency: channel credits sum exactly to v(full) - v(direct)") {
    val rows = Shapley.shapley(spark, sf).collect()
    assert(rows.length == Shapley.Channels.length)
    val vFull = rows.head.getLong(4)
    val vDirect = rows.head.getLong(5)
    // phi24 carries the exact 24ths lattice: Σ phi24 = 24·(v_full − v_∅)
    assert(rows.map(_.getLong(1)).sum == 24L * (vFull - vDirect),
      "Shapley efficiency must hold exactly on the factorial lattice")
    // monotone v ⇒ nonnegative credit
    assert(rows.forall(_.getLong(1) >= 0L))
  }

  test("dummy and symmetry on hand lattices") {
    // v additive in two symmetric channels, third is a dummy
    def phi(v: Map[Int, Long], bit: Int): Long = {
      val fact = Array(1L, 1L, 2L, 6L)
      (0 until 16).filter(s => (s & bit) == 0).map { s =>
        val k = Integer.bitCount(s)
        fact(k) * fact(3 - k) * (v(s | bit) - v(s))
      }.sum
    }
    // conversions only from masks containing bit1 or bit2, equally
    val byMask = Map(1 -> 10L, 2 -> 10L, 3 -> 5L)
    val v = (0 until 16).map(s => s -> (0 until 16)
      .filter(m => (m & s) == m).map(byMask.getOrElse(_, 0L)).sum).toMap
    assert(phi(v, 1) == phi(v, 2), "symmetric channels get equal credit")
    assert(phi(v, 4) == 0L, "a channel no coalition needs gets zero")
    assert(phi(v, 8) == 0L)
    // efficiency on the hand lattice too
    assert(Seq(1, 2, 4, 8).map(phi(v, _)).sum == 24L * (v(15) - v(0)))
  }
}
