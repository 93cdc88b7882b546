package graft

import graft.functions.CompressRatio
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CompressRatioSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("bit-parity with the sequential zlib reference on the corpus") {
    val docs = Tables.documents(spark, sf).limit(50)
    val got = docs.select(col("doc_id"), col("text"),
      CompressRatio.ratio(col("text")).as("r"))
      .as[(Long, String, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, text, r) =>
      val bytes = text.getBytes("UTF-8")
      val want = CompressRatio.deflatedLen(bytes).toDouble /
        math.max(1, bytes.length).toDouble
      assert(r == want, s"doc $id")
    }
  }

  test("repetitive text compresses below natural prose; noise doesn't compress") {
    val rep = "spam spam spam " * 200
    // long enough that the deflate header overhead amortizes — a
    // single short doc sits artificially high
    val nat = Tables.documents(spark, sf)
      .orderBy(col("doc_id")).limit(20).select(col("text")).as[String]
      .collect().mkString(" ")
    // deterministic pseudo-noise: base36 of a multiplicative sequence
    val noise = {
      var x = 1234567L
      (1 to 3000).map { _ =>
        x = (x * 6364136223846793005L + 1442695040888963407L)
        java.lang.Long.toUnsignedString(x, 36)
      }.mkString
    }
    val m = Seq((1L, rep), (2L, nat), (3L, noise)).toDF("doc_id", "text")
      .select(col("doc_id"), CompressRatio.ratio(col("text")).as("r"))
      .as[(Long, Double)].collect().toMap
    assert(m(1L) < 0.05, s"template text should collapse: ${m(1L)}")
    assert(m(1L) < m(2L) && m(2L) < m(3L),
      s"ordering violated: $m")
    assert(m(3L) > 0.5, s"noise should stay near-incompressible: ${m(3L)}")
  }

  test("empty and null are safe; ratio is scan-shaped (no Exchange)") {
    val out = Seq((1L, ""), (2L, null.asInstanceOf[String]), (3L, "abc"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), CompressRatio.ratio(col("text")).as("r"))
    val rows = out.collect()
    assert(rows.length == 3)
    assert(rows.find(_.getLong(0) == 2L).exists(_.isNullAt(1)))
    val plan = Tables.documents(spark, sf)
      .select(CompressRatio.ratio(col("text")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}
