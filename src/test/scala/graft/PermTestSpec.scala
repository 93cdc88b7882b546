package graft

import graft.operators.PermTest
import org.scalatest.funsuite.AnyFunSuite

class PermTestSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def armOf(uid: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"arm:$uid".getBytes).map("%02x".format(_)).mkString
    if (java.lang.Long.parseLong(md.take(7), 16) % 2 == 0) 1L else 0L
  }

  test("constant metric: every permuted diff ties the observed zero, p = 1") {
    val users = (0L until 400L).map(u => (u, 7L)).toDF("user_id", "y")
    val r = PermTest.permTestOfUsers(users).collect().head
    assert(r.getAs[Long]("obs_diff_micro") == 0L)
    assert(r.getAs[Long]("n_perms") == PermTest.Perms.toLong)
    assert(r.getAs[Long]("p_micro") == 1000000L)
    assert(r.getAs[Int]("significant_05") == 0)
  }

  test("a strong real effect survives every relabeling: p at the floor") {
    // y follows the ACTUAL assignment hash (arm 1 -> 100, arm 0 -> 1):
    // no md5-keyed relabeling reproduces that alignment
    val users = (0L until 400L)
      .map(u => (u, if (armOf(u) == 1L) 100L else 1L))
      .toDF("user_id", "y")
    val r = PermTest.permTestOfUsers(users).collect().head
    assert(math.abs(r.getAs[Long]("obs_diff_micro")) == 99000000L)
    assert(r.getAs[Long]("n_ge") == 0L)
    // the valid estimator counts the identity: floor = 1/(B+1), never 0
    assert(r.getAs[Long]("p_micro") == 1000000L / (PermTest.Perms + 1))
    assert(r.getAs[Int]("significant_05") == 1)
  }

  test("label noise drowns a tiny effect: the test refuses significance") {
    // y = wide hash-independent noise (sd ~ 28), shift of 1: the
    // permutation distribution easily covers the observed diff
    val users = (0L until 400L)
      .map(u => (u, 50L + (u * 2654435761L) % 97L +
        (if (armOf(u) == 1L) 1L else 0L)))
      .toDF("user_id", "y")
    val r = PermTest.permTestOfUsers(users).collect().head
    assert(r.getAs[Long]("p_micro") > 50000L)
    assert(r.getAs[Int]("significant_05") == 0)
  }
}
