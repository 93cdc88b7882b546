package graft

import graft.operators.{Corpus, Curate}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurateSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private lazy val out = Curate.curateQuery(spark, sf)
    .as[(Long, String, Long, Double, Long)].collect()

  test("dedup stage fires first: no injected copy survives, originals can") {
    val ids = out.map(_._1).toSet
    assert(out.nonEmpty)
    assert(!ids.exists(_ >= 1000000L),
      "an injected duplicate copy (id+1e6) outlived its lower-id original")
    assert(ids.exists(_ % 10 === 0L),
      "originals of duplicated docs must be eligible to survive")
  }

  test("every survivor passes the filter and bins respect the prefix-sum rule") {
    assert(out.forall(_._4 >= 0.5), "a below-threshold doc survived")
    out.groupBy(_._2).foreach { case (_, docs) =>
      val sorted = docs.sortBy(_._1)
      var prefix = 0L
      sorted.foreach { d =>
        assert(d._5 == prefix / Corpus.SeqTokens,
          s"doc ${d._1} bin ${d._5} != prefix rule ${prefix / Corpus.SeqTokens}")
        prefix += d._3
      }
    }
  }

  test("scale shape: no doc_id shuffle; one hash exchange + one window exchange") {
    val plan = Curate.curateQuery(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning(doc_id"),
      "the corpus must never shuffle on doc_id")
    assert(plan.contains("hashpartitioning(content_hash") ||
      plan.contains("hashpartitioning(source"),
      "dedup/pack exchanges keyed on content_hash/source")
  }
}
