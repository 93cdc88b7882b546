package graft

import graft.operators.Scrub
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LuhnSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def valid(nums: String*): Seq[Boolean] =
    nums.toSeq.toDF("num")
      .select(Scrub.luhnValid(col("num")).as("v"))
      .as[Boolean].collect().toSeq

  test("known Luhn vectors") {
    // 79927398713 is the classic worked example; flipping its check
    // digit must fail. 4532015112830366 is a standard 16-digit test PAN.
    assert(valid("79927398713") == Seq(true))
    assert(valid("79927398710", "79927398711", "79927398712",
      "79927398714") == Seq(false, false, false, false))
    assert(valid("4532015112830366") == Seq(true))
    assert(valid("4532015112830367") == Seq(false))
  }

  test("screen extracts runs, validates, masks — and leaves short runs alone") {
    val docs = Seq(
      (1L, "pay 4532015112830366 now"),
      (2L, "order 1234567890 is short"),          // 10 digits: no candidate
      (3L, "ref 4532015112830367 invalid run"),
      (4L, "no digits at all")
    ).toDF("doc_id", "text")
    val r = Scrub.cardScreen(docs)
      .as[(Long, String, Long, Boolean)].collect().sortBy(_._1)
    assert(r.map(_._1).toSeq == Seq(1L, 3L))
    val byDoc = r.map(x => x._1 -> x).toMap
    assert(byDoc(1L)._2 == "****0366" && byDoc(1L)._4)
    assert(byDoc(3L)._2 == "****0367" && !byDoc(3L)._4)
    assert(r.forall(_._3 == 16L))
  }

  test("a 20-digit run yields one 19-digit candidate (greedy, both engines)") {
    val docs = Seq((1L, "x 12345678901234567890 y")).toDF("doc_id", "text")
    val r = Scrub.cardScreen(docs).as[(Long, String, Long, Boolean)].collect()
    assert(r.length == 1 && r.head._3 == 19L)
  }

  test("fixture query: every 13th doc screened, some pass, most fail") {
    val r = Scrub.piiLuhn(spark, sf)
      .as[(Long, String, Long, Boolean)].collect()
    assert(r.nonEmpty)
    assert(r.forall(_._1 % 13 == 0))
    val passRate = r.count(_._4).toDouble / r.length
    assert(passRate < 0.5, s"synthetic runs should mostly fail Luhn: $passRate")
  }
}
