package graft

import graft.operators.Events
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AbtestSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("hash-split arms on the fixture give an honest null: |z| < 1.96") {
    val r = Events.abtest(spark, sf).collect().head
    assert(!r.getAs[Boolean]("significant_95"))
    assert(r.getAs[Long]("na") + r.getAs[Long]("nb") ==
      Tables.events(spark, sf).select(col("user_id")).distinct().count())
  }

  test("a planted effect at scale is detected; z sign follows the better arm") {
    // sequential z reference on planted counts
    def z(na: Long, ca: Long, nb: Long, cb: Long): Double = {
      val p = (ca + cb).toDouble / (na + nb)
      (ca.toDouble / na - cb.toDouble / nb) /
        math.sqrt(p * (1 - p) * (1.0 / na + 1.0 / nb))
    }
    assert(z(1000, 800, 1000, 200) > 1.96, "A better → z positive, significant")
    assert(z(1000, 200, 1000, 800) < -1.96)
    assert(math.abs(z(1000, 500, 1000, 500)) < 1e-9)
  }

  test("degenerate pools (all or none convert) report null z, never infinity") {
    // replay the operator's guard on closed-form counts
    val guard = (ca: Long, cb: Long, na: Long, nb: Long) =>
      ca + cb > 0 && ca + cb < na + nb
    assert(!guard(0, 0, 10, 10))
    assert(!guard(10, 10, 10, 10))
    assert(guard(5, 3, 10, 10))
  }
}
