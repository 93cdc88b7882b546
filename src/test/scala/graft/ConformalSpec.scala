package graft

import graft.operators.{Conformal, NaiveBayes}
import org.scalatest.funsuite.AnyFunSuite

class ConformalSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("separable corpus: 95% target accepts the separable mass, rejects the noise") {
    // lang decoupled from the cal/eval parity split (id/2 parity);
    // ids < 300: text separable by lang; ids >= 300: identical noise
    val docs = (0L until 600L).map { id =>
      val lang = if ((id / 2) % 2 == 0) "en" else "de"
      val text =
        if (id < 300)
          (if (lang == "en") "alpha alpha beta gamma delta"
           else "zulu zulu yankee xray whiskey")
        else "lorem ipsum dolor sit amet"
      (id, lang, text)
    }.toDF("doc_id", "lang", "text")
    val out = Conformal.conformalOf(
      NaiveBayes.classify(docs), targetPct = 95L).collect().head
    assert(!out.isNullAt(0), "tau must exist on a separable corpus")
    val calCov = out.getDouble(1); val calAcc = out.getDouble(2)
    val evalAcc = out.getDouble(4)
    // the integer rule guarantees the calibration bound by construction
    assert(calAcc >= 0.95, s"cal accuracy $calAcc")
    // roughly the separable half accepted, the noise half refused
    assert(calCov > 0.2 && calCov < 0.8, s"cal coverage $calCov")
    // selection generalizes: accepted eval docs are the separable ones
    assert(evalAcc >= 0.9, s"eval accuracy $evalAcc")
  }

  test("unreachable target reports the NULL row, never a division") {
    val docs = (0L until 200L).map { id =>
      val lang = if ((id / 2) % 2 == 0) "en" else "de"
      (id, lang, "lorem ipsum dolor sit amet") // pure noise
    }.toDF("doc_id", "lang", "text")
    val out = Conformal.conformalOf(
      NaiveBayes.classify(docs), targetPct = 100L).collect().head
    assert(out.isNullAt(0) && out.isNullAt(1) && out.isNullAt(2))
    assert(out.getDouble(3) == 0.0) // eval coverage of the empty accept set
    assert(out.isNullAt(4))
  }
}
