package graft

import graft.operators.Rfm
import org.scalatest.funsuite.AnyFunSuite

class RfmSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val rows = Rfm.rfm(spark, "/root/testdata/sf0.001").collect()

  test("scores stay in 1..5 and the census partitions the user base") {
    assert(rows.nonEmpty)
    for (c <- Seq("r", "f", "m"); r <- rows) {
      val v = r.getAs[Long](c)
      assert(v >= 1L && v <= 5L, s"$c = $v")
    }
    // segment cells are disjoint by construction; total = user count
    val total = rows.map(_.getAs[Long]("n_users")).sum
    val users = Tables.events(spark, "/root/testdata/sf0.001")
      .select("user_id").distinct().count()
    assert(total == users)
  }

  test("quintiles are near-even per dimension (ties may skew a bucket)") {
    val total = rows.map(_.getAs[Long]("n_users")).sum.toDouble
    for (c <- Seq("r", "f", "m")) {
      val byScore = rows.groupBy(_.getAs[Long](c))
        .map { case (k, rs) => k -> rs.map(_.getAs[Long]("n_users")).sum }
      // every quintile is populated and no quintile hoards the base
      assert(byScore.keySet.size >= 4, s"$c uses ${byScore.keySet}")
      assert(byScore.values.max <= total * 0.45, s"$c skew ${byScore}")
    }
  }

  test("monetary mass concentrates in high m-scores (the segmentation's point)") {
    def mass(p: org.apache.spark.sql.Row => Boolean) =
      rows.filter(p).map(_.getAs[Long]("mon_total")).sum.toDouble
    val top = mass(_.getAs[Long]("m") >= 4L)
    val bottom = mass(_.getAs[Long]("m") <= 2L)
    assert(top > bottom, s"top-m mass $top must exceed bottom-m $bottom")
  }
}
