package graft

import graft.operators.{Conformal, NaiveBayes}
import org.scalatest.funsuite.AnyFunSuite

/** The served operating point against the exact one on the planted
  * separable corpus (the ConformalSpec fixture): coverage tracks
  * within the stamped DKW band, realized accuracy meets the target
  * within binomial slack.
  */
class ConformalServedSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def separable = (0L until 600L).map { id =>
    val lang = if ((id / 2) % 2 == 0) "en" else "de"
    val text =
      if (id < 300)
        (if (lang == "en") "alpha alpha beta gamma delta"
         else "zulu zulu yankee xray whiskey")
      else "lorem ipsum dolor sit amet"
    (id, lang, text)
  }.toDF("doc_id", "lang", "text")

  test("served tau tracks the exact operating point within the coverage band") {
    val classified = NaiveBayes.classify(separable).localCheckpoint()
    val exact = Conformal.conformalOf(classified, targetPct = 95L)
      .collect().head
    val served = Conformal.conformalServedOf(classified, targetPct = 95L)
      .collect().head
    assert(!served.isNullAt(0), "served tau must exist on a separable corpus")
    val eps = served.getAs[Double]("cov_eps")
    val exactCov = exact.getAs[Double]("eval_coverage")
    val servedCov = served.getAs[Double]("eval_coverage")
    // the sample decision may sit a band away from the exact one
    assert(math.abs(servedCov - exactCov) <= eps + 0.1,
      s"served coverage $servedCov vs exact $exactCov (eps=$eps)")
    // realized accuracy at the served tau still clears the target
    // within binomial slack on the accepted eval mass
    val evalAcc = served.getAs[Double]("eval_accuracy")
    assert(evalAcc >= 0.85, s"served eval accuracy $evalAcc")
  }

  test("unreachable target: served form reports the NULL row too") {
    val noise = (0L until 200L).map { id =>
      val lang = if ((id / 2) % 2 == 0) "en" else "de"
      (id, lang, "lorem ipsum dolor sit amet")
    }.toDF("doc_id", "lang", "text")
    val out = Conformal.conformalServedOf(
      NaiveBayes.classify(noise), targetPct = 95L).collect().head
    assert(out.isNullAt(0), "tau must be NULL when the target is unreachable")
  }
}
