package graft

import graft.operators.Balance
import org.scalatest.funsuite.AnyFunSuite

class BalanceSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  // (user_id ignored by balanceOf; columns t, views, signups, errors)
  private def run(users: Seq[(Long, Long, Long, Long)]) =
    Balance.balanceOf(users.toDF("t", "views", "signups", "errors"))
      .collect().map(r => r.getAs[String]("covariate") -> r).toMap

  test("identical arm distributions: SMD exactly 0, balanced") {
    val arm = Seq(0L, 5L, 10L, 15L)
    val users = for (t <- Seq(0L, 1L); v <- arm) yield (t, v, v, v)
    val out = run(users)
    for (cov <- Seq("views", "signups", "errors")) {
      assert(out(cov).getAs[Double]("smd") == 0.0)
      assert(out(cov).getAs[Int]("imbalanced") == 0)
    }
  }

  test("planted shift: |SMD| crosses the 0.1 convention") {
    // treated views sit one within-arm sd above control
    val users = (0L until 40L).map { u =>
      val t = u % 2
      (t, 100L + t * 10L + (u % 5L), 3L, 3L)
    }
    val out = run(users)
    assert(math.abs(out("views").getAs[Double]("smd")) > 0.1)
    assert(out("views").getAs[Int]("imbalanced") == 1)
    // the untouched covariates stay balanced... and constant ones NULL
    assert(out("signups").isNullAt(
      out("signups").fieldIndex("smd"))) // zero pooled variance
  }

  test("hand SMD: means 10 vs 8, both variances 4 -> smd = 1.0") {
    // each arm alternates m-2, m+2: mean m, sample variance 16/3? no --
    // use 4 points m-2,m-2,m+2,m+2: mean m, var = 16/3. Pick values so
    // var = 4: m-2, m+2 twice => s2 = (4*... compute directly instead
    val tArm = Seq(8L, 12L, 8L, 12L)  // mean 10, s2 = 16/3
    val cArm = Seq(6L, 10L, 6L, 10L)  // mean 8,  s2 = 16/3
    val users = tArm.map(v => (1L, v, 0L, 0L)) ++ cArm.map(v => (0L, v, 0L, 0L))
    val out = run(users)
    val s2 = 16.0 / 3.0
    val exp = math.floor((10.0 - 8.0) / math.sqrt(s2) * 1e6 + 0.5) / 1e6
    assert(out("views").getAs[Double]("smd") == exp)
  }

  test("tiny arm (n=1): SMD NULL, never a zero-division") {
    val users = Seq((1L, 5L, 1L, 1L), (0L, 3L, 1L, 1L), (0L, 7L, 2L, 2L))
    val out = run(users)
    assert(out("views").isNullAt(out("views").fieldIndex("smd")))
  }
}
