package graft

import graft.operators.PostStrat
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

class PostStratSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def readout(users: Seq[(Long, String, Long)]): Row =
    PostStrat.fromUsers(users.toDF("g", "variant", "y")).collect().head

  test("Simpson-style imbalance: stratified recovers the zero effect raw cannot") {
    // stratum 0 is A-heavy at level 10, stratum 1 B-heavy at level 0;
    // within every stratum the arm difference is EXACTLY zero
    val users =
      Seq.fill(8)((0L, "A", 10L)) ++ Seq.fill(2)((0L, "B", 10L)) ++
        Seq.fill(2)((1L, "A", 0L)) ++ Seq.fill(8)((1L, "B", 0L))
    val r = readout(users)
    assert(r.getAs[Double]("tau_raw") == 6.0) // (80/10) - (20/10)
    assert(r.getAs[Double]("tau_strat") == 0.0) // exact: dgm = 0 per stratum
    assert(r.getAs[Double]("se_strat") == 0.0) // zero within-cell variance
    assert(r.getAs[Double]("var_reduction") == 1.0)
  }

  test("constant within-stratum effect: tau_strat exact, se_strat exactly 0") {
    // y = 10g + 1 on A, 10g on B, 3 users per cell: every cell variance
    // numerator n·Σy² − (Σy)² is exactly 0 and every mean divides
    val users = (0L to 3L).flatMap(g =>
      Seq.fill(3)((g, "A", 10 * g + 1)) ++ Seq.fill(3)((g, "B", 10 * g)))
    val r = readout(users)
    assert(r.getAs[Double]("tau_strat") == 1.0)
    assert(r.getAs[Double]("se_strat") == 0.0)
    assert(r.getAs[Double]("se_raw") > 0.0) // between-stratum spread leaks in
    assert(r.getAs[Double]("var_reduction") == 1.0)
  }

  test("homogeneous strata: stratified reduces to the raw difference") {
    // identical composition in every stratum: stratification buys
    // nothing and must not cost anything. Cells are 16 users per arm
    // so the (n_g−1) vs (n−1) small-sample correction (which INFLATES
    // the stratified estimate on tiny cells — realized, not a bug)
    // shrinks to ~n_g/(n_g−1)·(n−1)/n ≈ 1.05
    val block = Seq.fill(8)(Seq(("A", 3L), ("A", 5L), ("B", 2L), ("B", 6L)))
      .flatten
    val users = (0L to 3L).flatMap(g => block.map { case (v, y) => (g, v, y) })
    val r = readout(users)
    assert(math.abs(r.getAs[Double]("tau_strat") - r.getAs[Double]("tau_raw")) < 1e-5)
    assert(math.abs(r.getAs[Double]("var_reduction")) < 0.1)
  }

  test("a stratum-arm with n <= 1 nulls the stratified readout, keeps raw") {
    val users =
      Seq.fill(4)((0L, "A", 5L)) ++ Seq.fill(4)((0L, "B", 3L)) ++
        Seq((1L, "A", 9L)) ++ Seq.fill(3)((1L, "B", 2L)) // n_1A = 1
    val r = readout(users)
    assert(!r.isNullAt(r.fieldIndex("tau_raw")))
    assert(r.isNullAt(r.fieldIndex("tau_strat")))
    assert(r.isNullAt(r.fieldIndex("se_strat")))
  }
}
