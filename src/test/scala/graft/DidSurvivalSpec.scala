package graft

import graft.operators.{Did, Survival, TpchMore}
import org.scalatest.funsuite.AnyFunSuite

/** Batch specs for the causal/survival/classic-DSS additions. */
class DidSurvivalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("DiD algebra: estimate = treated delta minus control delta, exactly") {
    val r = Did.did(spark, sf).collect().head
    assert(r.getAs[Long]("treated_delta_micro") ==
      r.getAs[Long]("t_post") - r.getAs[Long]("t_pre"))
    assert(r.getAs[Long]("control_delta_micro") ==
      r.getAs[Long]("c_post") - r.getAs[Long]("c_pre"))
    assert(r.getAs[Long]("did_micro") ==
      r.getAs[Long]("treated_delta_micro") - r.getAs[Long]("control_delta_micro"))
    // a null effect on the symmetric fixture: DiD well inside the
    // spread of the cell means (no planted launch in the corpus)
    assert(math.abs(r.getAs[Long]("did_micro")) <
      math.abs(r.getAs[Long]("t_pre")) + math.abs(r.getAs[Long]("c_pre")))
    assert(r.getAs[Long]("n_treated_cells") > 0)
    assert(r.getAs[Long]("n_control_cells") > 0)
  }

  test("Nelson-Aalen curve: risk sets telescope, hazard accumulates monotonically") {
    val rows = Survival.survival(spark, sf).collect().sortBy(_.getLong(0))
    assert(rows.nonEmpty)
    // n_risk is non-increasing and starts at the full user count
    val users = Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.col("user_id"))
      .distinct().count()
    assert(rows.head.getLong(1) == users)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getLong(1) == a.getLong(1) - (a.getLong(2) + a.getLong(3)),
          "risk set must shrink by exactly the users leaving at t")
        assert(b.getLong(5) >= a.getLong(5), "cumulative hazard is monotone")
      case _ => ()
    }
    // each term is the micro-fixed d/n
    rows.foreach { r =>
      assert(r.getLong(4) == r.getLong(2) * 1000000L / r.getLong(1))
    }
    // censored users exist (the corpus ends while some users are active)
    assert(rows.map(_.getLong(3)).sum > 0, "censoring must be exercised")
  }

  test("promo share is the exact conditional-aggregate ratio") {
    val rows = TpchMore.q14Promo(spark, sf).collect()
    assert(rows.length == 12)
    rows.foreach { r =>
      val share = r.getAs[Double]("promo_share")
      assert(share >= 0.0 && share <= 1.0)
      assert(r.getAs[Double]("promo_revenue") <= r.getAs[Double]("total_revenue"))
    }
  }

  test("q7 trade flows: pairs exclude self-trade and cover both directions") {
    val rows = TpchMore.q7Volume(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getString(0) != r.getString(1)))
    val years = rows.map(_.getLong(2)).distinct.sorted
    assert(years.forall(y => y == 1996L || y == 1997L))
  }
}
