package graft

import graft.operators.Events
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SrmSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def armOf(uid: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"arm:$uid".getBytes).map("%02x".format(_)).mkString
    if (java.lang.Long.parseLong(md.take(7), 16) % 2 == 0) 1L else 0L
  }

  test("healthy split: the md5 hash balances and no SRM fires") {
    val r = Events.srmOfUsers((0L until 2000L).toDF("user_id"))
      .collect().head
    val (na, nb) = (r.getAs[Long]("na"), r.getAs[Long]("nb"))
    assert(na + nb == 2000L)
    // the hash split is near-even; chi2 far under the 0.001 critical
    assert(r.getAs[Long]("chi2_micro") ==
      (na - nb) * (na - nb) * 1000000L / 2000L)
    assert(r.getAs[Long]("chi2_micro") < Events.SrmCritMicro)
    assert(r.getAs[Int]("srm_detected") == 0)
  }

  test("a broken pipeline (one arm losing users) trips the alarm") {
    // drop 40% of arm-B users — the bots-filtered-from-one-arm bug
    val ids = (0L until 2000L).filter(u => armOf(u) == 1L || u % 5 >= 2)
    val r = Events.srmOfUsers(ids.toDF("user_id")).collect().head
    assert(r.getAs[Long]("na") > r.getAs[Long]("nb"))
    assert(r.getAs[Long]("chi2_micro") >= Events.SrmCritMicro)
    assert(r.getAs[Int]("srm_detected") == 1)
  }

  test("empty frame reports NULL chi2, no verdict") {
    val r = Events.srmOfUsers(Seq.empty[Long].toDF("user_id"))
      .collect().head
    assert(r.isNullAt(r.fieldIndex("chi2_micro")))
    assert(r.isNullAt(r.fieldIndex("srm_detected")))
  }
}
