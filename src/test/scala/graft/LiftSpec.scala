package graft

import graft.operators.Lift
import org.scalatest.funsuite.AnyFunSuite

class LiftSpec extends AnyFunSuite {
  import SparkTestSession._

  test("the sketch's gains chart is honest: injected duplicates concentrate at the top") {
    val rows = Lift.liftQuery(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .sortBy(_._1)
    assert(rows.nonEmpty && rows.head._1 == 0L)
    // capture is a cumulative distribution: monotone to 1.0
    val caps = rows.map(_._5)
    assert(caps.zip(caps.tail).forall { case (a, b) => a <= b + 1e-9 })
    assert(math.abs(caps.last - 1.0) < 1e-9)
    // accounting: docs and dups add up across deciles
    val totalDocs = rows.map(_._2).sum
    val totalDup = rows.map(_._3).sum
    assert(totalDocs > 0 && totalDup > 0)
    // the top decile must beat the base rate — the injected clones'
    // repeated shingles push their mean df up; lift ≈ 1 at the top
    // would mean the sketch ranks noise
    assert(rows.head._6 > 1.5, s"top-decile lift ${rows.head._6}")
    // weighted mean lift over deciles is 1 by construction
    val meanLift = rows.map(r => r._6 * r._2).sum / totalDocs
    assert(math.abs(meanLift - 1.0) < 0.02, s"mean lift $meanLift")
  }
}
