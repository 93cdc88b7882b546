package graft

import graft.operators.Uplift
import org.scalatest.funsuite.AnyFunSuite

class UpliftSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("score that finds movable users: top decile uplift 1e6, area > 0") {
    // treatment converts ONLY high-score users; controls never convert
    val users = (0L until 200L).map { u =>
      val t = u % 2
      val score = u // distinct scores: deciles are exact 20-user blocks
      val y = if (t == 1L && score >= 160L) 1L else 0L
      (score, y, t)
    }
    val rows = Uplift.upliftOf(users.toDF("score", "y", "t")).collect()
    val byDecile = rows.map(r => r.getAs[Long]("decile") -> r).toMap
    assert(byDecile(0L).getAs[Long]("uplift_micro") == 1000000L)
    assert(byDecile(9L).getAs[Long]("uplift_micro") == 0L)
    assert(rows.head.getAs[Long]("qini_area_micro") > 0L)
  }

  test("everyone converts: uplift and qini exactly zero everywhere") {
    val users = (0L until 100L).map(u => (u, 1L, u % 2))
    val rows = Uplift.upliftOf(users.toDF("score", "y", "t")).collect()
    assert(rows.forall(_.getAs[Long]("uplift_micro") == 0L))
    assert(rows.forall(_.getAs[Long]("qini_micro") == 0L))
    assert(rows.head.getAs[Long]("qini_area_micro") == 0L)
  }

  test("decile accounting: counts and conversions sum to the totals") {
    val users = (0L until 173L).map(u =>
      (u % 37L, if ((u * 7) % 3 == 0) 1L else 0L, u % 2))
    val rows = Uplift.upliftOf(users.toDF("score", "y", "t")).collect()
    assert(rows.map(_.getAs[Long]("n_treated")).sum ==
      users.count(_._3 == 1L))
    assert(rows.map(_.getAs[Long]("n_control")).sum ==
      users.count(_._3 == 0L))
    assert(rows.map(_.getAs[Long]("y_treated")).sum ==
      users.count(u => u._3 == 1L && u._2 == 1L))
  }

  test("tied scores stay in one decile (no tie splitting)") {
    // one massive tied block: all 50 users share score 5
    val users = (0L until 50L).map(u => (5L, u % 3 / 2, u % 2))
    val rows = Uplift.upliftOf(users.toDF("score", "y", "t")).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("decile") == 0L)
  }
}
