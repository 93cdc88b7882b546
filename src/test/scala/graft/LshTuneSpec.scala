package graft

import graft.operators.LshTune
import org.scalatest.funsuite.AnyFunSuite

class LshTuneSpec extends AnyFunSuite {

  test("S-curve sanity: monotone in s, more bands raise it, more rows steepen it") {
    val ss = (1 to 9).map(_ / 10.0)
    val curve = ss.map(LshTune.pCollide(_, 16, 4))
    assert(curve.zip(curve.tail).forall { case (a, b) => a <= b })
    assert(LshTune.pCollide(0.5, 32, 4) > LshTune.pCollide(0.5, 16, 4))
    // higher r: lower collision below threshold (steeper left tail)
    assert(LshTune.pCollide(0.3, 8, 8) < LshTune.pCollide(0.3, 16, 4))
  }

  test("tuned banding tracks the target threshold") {
    for (tau <- Seq(0.5, 0.8, 0.95)) {
      val (b, r) = LshTune.tune(64, tau)
      assert(b * r <= 64)
      val eff = LshTune.effectiveThreshold(b, r)
      assert(math.abs(eff - tau) < 0.1,
        s"tau $tau -> ($b, $r), effective $eff")
    }
  }

  test("rows per band grow with the threshold (steeper step further right)") {
    val rs = Seq(0.5, 0.7, 0.9).map(LshTune.tune(64, _)._2)
    assert(rs.zip(rs.tail).forall { case (a, b) => a <= b }, rs.toString)
  }

  test("discounting false positives biases toward recall (effective threshold drops)") {
    val eq = LshTune.effectiveThreshold _ tupled LshTune.tune(64, 0.8, fpWeight = 1.0)
    val fp = LshTune.effectiveThreshold _ tupled LshTune.tune(64, 0.8, fpWeight = 0.02)
    assert(fp < eq,
      s"cheap FPs must move the curve left: $fp !< $eq")
    // the house 16x4 banding is this trade taken to its limit: its
    // effective threshold sits far below the 0.8 verify bar
    assert(LshTune.effectiveThreshold(16, 4) < 0.55)
  }

  test("the tuned curve beats the house banding on symmetric error at its own tau") {
    assert(LshTune.curveError(5, 11, 0.8) < LshTune.curveError(16, 4, 0.8),
      "equal-weight tuning should out-score a recall-biased banding")
  }
}
