package graft

import graft.operators.Keywords
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KeywordsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("doc-unique term outranks corpus-wide term; short glue words cut") {
    val docs = Seq(
      (1L, "zebra zebra common common common in in in in"),
      (2L, "common words here here"),
      (3L, "common words also also")).toDF("doc_id", "text")
    val r = Keywords.keywords(docs)
      .select(col("doc_id"), col("rk"), col("term"))
      .as[(Long, Long, String)].collect()
    // "in" (len 2) never appears
    assert(!r.exists(_._3 == "in"))
    // doc 1's top keyword is the doc-unique "zebra" (df=1) despite
    // "common" having higher tf (3 vs 2) — idf dominates: 2·ln3 > 3·ln1
    val doc1 = r.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    assert(doc1.head == "zebra", s"got $doc1")
  }

  test("rank is dense per doc, capped at TopK, ties broken by term") {
    val r = Keywords.keywordsQuery(spark, sf)
      .select(col("doc_id"), col("rk"), col("term"), col("tfidf"))
      .as[(Long, Long, String, Double)].collect()
    assert(r.nonEmpty)
    r.groupBy(_._1).foreach { case (id, rows) =>
      val rks = rows.map(_._2).sorted
      assert(rks.toSeq == (1L to rks.length).toSeq, s"doc $id ranks $rks")
      assert(rks.length <= Keywords.TopK)
      // within a doc, scores non-increasing by rank; ties term-ascending
      val byRank = rows.sortBy(_._2)
      byRank.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 > b._4 || (a._4 == b._4 && a._3 < b._3),
            s"doc $id: rank order violated")
        case _ => ()
      }
    }
  }
}
