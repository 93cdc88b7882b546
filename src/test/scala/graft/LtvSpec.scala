package graft

import java.sql.Timestamp
import graft.operators.Ltv
import org.scalatest.funsuite.AnyFunSuite

class LtvSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  // week boundaries are epoch-week indexes: anchor on a known epoch week
  private val weekMs = 604800000L
  private val base = (1704067200L / 604800L + 1L) * weekMs // clean boundary

  private def ts(week: Int, h: Int = 1) =
    new Timestamp(base + week * weekMs + h * 3600000L)

  test("LTV curve closed form: two cohorts, quiet weeks are flat steps") {
    val ev = Seq(
      // cohort A: users 1, 2 first seen week 0
      (1L, "view", ts(0), 0.0),
      (2L, "view", ts(0), 0.0),
      (1L, "purchase", ts(0, 5), 10.0),
      (2L, "purchase", ts(1), 4.0),
      (1L, "purchase", ts(3), 6.0),      // week 2 is quiet
      // cohort B: user 3 first seen week 2
      (3L, "view", ts(2), 0.0),
      (3L, "purchase", ts(3), 8.0))
      .toDF("user_id", "event_type", "ts", "value")
    val rows = Ltv.cohortLtv(ev).collect()
      .map(r => (r.getAs[Long]("cohort") - r.getAs[Long]("cohort"), r))
      .map(_._2)
    val cohorts = rows.map(_.getAs[Long]("cohort")).distinct.sorted
    assert(cohorts.length == 2)
    val (a, b) = (cohorts(0), cohorts(1))
    assert(b == a + 2)
    val byKey = rows.map(r => (r.getAs[Long]("cohort"), r.getAs[Long]("off")) ->
      ((r.getAs[Long]("cohort_users"), r.getAs[Long]("week_value_micro"),
        r.getAs[Long]("cum_value_micro"), r.getAs[Long]("ltv_micro")))).toMap
    // cohort A: 2 users, offsets 0..3 dense
    assert(byKey((a, 0L)) == ((2L, 10000000L, 10000000L, 5000000L)))
    assert(byKey((a, 1L)) == ((2L, 4000000L, 14000000L, 7000000L)))
    assert(byKey((a, 2L)) == ((2L, 0L, 14000000L, 7000000L)),
      "quiet week must appear as a flat step")
    assert(byKey((a, 3L)) == ((2L, 6000000L, 20000000L, 10000000L)))
    // cohort B: 1 user, offsets 0..1 (span ends at global max week 3)
    assert(byKey((b, 0L)) == ((1L, 0L, 0L, 0L)))
    assert(byKey((b, 1L)) == ((1L, 8000000L, 8000000L, 8000000L)))
    assert(byKey.size == 6, s"dense grids only to the horizon: ${byKey.keys}")
  }
}
