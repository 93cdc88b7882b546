package graft

import graft.operators.MannWhitney
import org.scalatest.funsuite.AnyFunSuite

class MannWhitneySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def armOf(uid: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"arm:$uid".getBytes).map("%02x".format(_)).mkString
    if (java.lang.Long.parseLong(md.take(7), 16) % 2 == 0) 1L else 0L
  }

  test("complete separation: U = n_a*n_b (as 2U), positive significant z") {
    val users = (0L until 300L)
      .map(u => (u, if (armOf(u) == 1L) 100L else 1L))
      .toDF("user_id", "y")
    val na = (0L until 300L).count(armOf(_) == 1L).toLong
    val nb = 300L - na
    val r = MannWhitney.mannWhitneyOfUsers(users).collect().head
    assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("n_b") == nb)
    // arm 1 beats arm 0 in every cross pair: 2U = 2*na*nb exactly
    assert(r.getAs[Long]("u_x2") == 2L * na * nb)
    assert(r.getAs[Double]("z") > 0.0)
    assert(r.getAs[Int]("significant_05") == 1)
  }

  test("all-tied corpus: variance collapses to zero, z is NULL") {
    val users = (0L until 100L).map(u => (u, 7L)).toDF("user_id", "y")
    val r = MannWhitney.mannWhitneyOfUsers(users).collect().head
    // tie term (n^3 - n) exactly cancels the (n+1)n(n-1) factor
    assert(r.getAs[Long]("tie_term") == 100L * 100L * 100L - 100L)
    assert(r.isNullAt(r.fieldIndex("z")))
    assert(r.isNullAt(r.fieldIndex("significant_05")))
  }

  test("mid-rank tie handling matches the hand computation (U = 1.5)") {
    // pick two arm-1 users and one arm-0 user from the hash stream
    val a = (0L until 1000L).filter(armOf(_) == 1L).take(2)
    val b = (0L until 1000L).filter(armOf(_) == 0L).take(1)
    // arm-1 ys {1, 2}, arm-0 y {1}: one tie (0.5) + one win (1) = U 1.5
    val users = Seq((a(0), 1L), (a(1), 2L), (b(0), 1L)).toDF("user_id", "y")
    val r = MannWhitney.mannWhitneyOfUsers(users).collect().head
    assert(r.getAs[Long]("u_x2") == 3L) // 2U
    assert(r.getAs[Long]("tie_term") == 6L) // one group of 2: 2^3-2
  }

  test("identical within-arm distributions: z near zero, not significant") {
    // cycle each arm through the SAME value set {0..9} (y = within-arm
    // index mod 10), so both samples are near-uniform on {0..9} and
    // differ by at most one count per value — a true null by
    // construction, not a hope about hash noise
    val ids = (0L until 400L)
    val byArm = ids.groupBy(armOf).map { case (a, us) =>
      a -> us.zipWithIndex.map { case (u, i) => (u, (i % 10).toLong) }
    }
    val users = byArm.values.flatten.toSeq.toDF("user_id", "y")
    val r = MannWhitney.mannWhitneyOfUsers(users).collect().head
    assert(math.abs(r.getAs[Double]("z")) < 0.5)
    assert(r.getAs[Int]("significant_05") == 0)
  }
}
