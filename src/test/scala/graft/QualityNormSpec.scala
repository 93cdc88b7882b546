package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QualityNormSpec extends AnyFunSuite {
  import SparkTestSession._

  test("percentiles are uniform within every domain — the calibration property") {
    val rows = TextAnalysis.qualityNorm(spark, sf).collect()
    assert(rows.nonEmpty)
    val byDom = rows.groupBy(_.getAs[String]("source"))
    byDom.foreach { case (dom, rs) =>
      val n = rs.length.toLong
      val ranks = rs.map(_.getAs[Long]("dom_rank")).sorted
      assert(ranks.toSeq == (1L to n), s"$dom: ranks must be a permutation")
      val pcts = rs.sortBy(_.getAs[Long]("dom_rank")).map(_.getAs[Long]("pct_micro"))
      assert(pcts.head == 0L && (n == 1L || pcts.last == 1000000L),
        s"$dom: endpoints pin 0 and 1e6")
      assert(pcts.toSeq == pcts.sorted.toSeq, s"$dom: pct monotone in rank")
    }
    // cross-domain calibration: every domain's top doc scores the SAME
    // pct (1e6) even though raw quality scales differ by domain
    val tops = byDom.values.map(rs =>
      rs.maxBy(_.getAs[Long]("dom_rank")).getAs[Long]("pct_micro")).toSet
    assert(tops == Set(1000000L))
    // "keep each domain's best ~30%" selects near-equal RATES per
    // domain (within rounding) — the property a raw threshold lacks
    val kept = byDom.view.mapValues { rs =>
      rs.count(_.getAs[Long]("pct_micro") >= 700000L).toDouble / rs.length
    }.toMap
    kept.foreach { case (dom, rate) =>
      assert(rate > 0.2 && rate < 0.4, s"$dom kept at $rate, expected ~0.3")
    }
  }
}
