package graft

import graft.operators.Blocklist
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BlocklistSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("C4 strict gate: any hit drops; soft gate thresholds the rate") {
    val docs = Seq(
      (1L, "clean words only here nothing listed"), // 0 hits
      (2L, "one big word inside a long clean stretch of table talk"), // 1/12
      (3L, "big slow big slow vector vector"), // 6/6
    ).toDF("doc_id", "text")
    val m = Blocklist.screen(docs, "doc_id", "text")
      .select(col("doc_id"), col("n_hits"), col("n_terms"),
        col("hit_frac"), col("keep_strict"), col("keep_soft"))
      .as[(Long, Long, Long, Double, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(m(1L)._2 == 0 && m(1L)._5 && m(1L)._6)
    assert(m(2L)._2 == 1 && m(2L)._3 == 1 && !m(2L)._5 && m(2L)._6,
      s"one stray hit must fail strict but pass soft: ${m(2L)}")
    assert(m(3L)._2 == 6 && m(3L)._3 == 3 && !m(3L)._5 && !m(3L)._6)
    assert(m(3L)._4 == 1.0)
  }

  test("counts match a brute recount; n_terms is distinct-term cardinality") {
    val docs = Seq(
      (1L, "slow slow slow table"),
      (2L, "vector big slow vector")).toDF("doc_id", "text")
    val got = Blocklist.screen(docs, "doc_id", "text")
      .select(col("doc_id"), col("n_hits"), col("n_terms"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val bl = Blocklist.Terms.toSet
    for ((id, text) <- Seq(1L -> "slow slow slow table", 2L -> "vector big slow vector")) {
      val toks = text.split(" ").filter(_.nonEmpty)
      assert(got(id)._1 == toks.count(bl), s"doc $id hit count")
      assert(got(id)._2 == toks.filter(bl).distinct.length, s"doc $id term count")
    }
  }

  test("screen is scan-shaped: no Exchange in the plan") {
    val plan = Blocklist.screen(Tables.documents(spark, sf), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "blocklist screen must ride the scan")
  }

  test("gates discriminate on the corpus (both keep and drop occur)") {
    val out = Blocklist.blocklist(spark, sf)
    val agg = out.agg(
      sum(when(col("keep_strict"), 1).otherwise(0)).cast("long"),
      sum(when(col("keep_soft"), 1).otherwise(0)).cast("long"),
      count(lit(1))).as[(Long, Long, Long)].head()
    assert(agg._1 > 0 && agg._1 < agg._3, s"strict gate degenerate: $agg")
    assert(agg._2 > agg._1 && agg._2 < agg._3, s"soft gate degenerate: $agg")
  }
}
