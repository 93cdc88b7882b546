package graft

import graft.operators.WindowChunk
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WindowChunkSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def doc(n: Int, id: Long = 1L) =
    (id, (1 to n).map(i => s"w$i").mkString(" "))

  test("every chunk is exactly W tokens; short docs yield one whole chunk") {
    val docs = Seq(doc(100), (2L, "just five little words here"), doc(32, 3L))
      .toDF("doc_id", "text")
    val out = WindowChunk.slide(docs, "doc_id", "text", w = 32, s = 24)
      .select(col("doc_id"), col("chunk_index"), col("start_tok"),
        col("n_tokens"), col("chunk_text"))
      .as[(Long, Long, Long, Long, String)].collect()
    val byDoc = out.groupBy(_._1)
    // n=100: windows at 1, 25, 49, 69 (clamped from 73) -> 4 chunks
    val d1 = byDoc(1L).sortBy(_._2)
    assert(d1.map(_._3).toSeq == Seq(1L, 25L, 49L, 69L), s"starts: ${d1.toSeq}")
    assert(d1.forall(c => c._5.split(" ").length == 32))
    assert(byDoc(2L).map(c => (c._3, c._4)).toSeq == Seq((1L, 5L)))
    assert(byDoc(1L).head._4 == 32L)
  }

  test("coverage and overlap: every token appears; adjacent chunks share W-S") {
    for (n <- Seq(33, 56, 57, 80, 200)) {
      val out = WindowChunk.slide(Seq(doc(n)).toDF("doc_id", "text"),
        "doc_id", "text", w = 32, s = 24)
        .orderBy(col("chunk_index"))
        .select(col("start_tok"), col("chunk_text"))
        .as[(Long, String)].collect()
      val covered = out.flatMap { case (st, txt) =>
        val k = txt.split(" ").length; (st until st + k) }.toSet
      assert(covered == (1L to n).toSet, s"n=$n coverage hole")
      // last window reaches exactly the end
      val (lastSt, lastTxt) = out.last
      assert(lastSt + lastTxt.split(" ").length - 1 == n)
      // non-final starts advance by exactly S
      val starts = out.map(_._1)
      starts.sliding(2).toSeq.dropRight(1).foreach { p =>
        assert(p(1) - p(0) == 24, s"n=$n stride broken: ${starts.toSeq}") }
    }
  }

  test("chunk content matches the token slice it claims") {
    val n = 77
    val toks = (1 to n).map(i => s"w$i")
    val out = WindowChunk.slide(Seq(doc(n)).toDF("doc_id", "text"),
      "doc_id", "text", w = 32, s = 24)
      .select(col("start_tok"), col("chunk_text")).as[(Long, String)].collect()
    out.foreach { case (st, txt) =>
      assert(txt == toks.slice(st.toInt - 1, st.toInt - 1 + 32).mkString(" "))
    }
  }

  test("slide is scan-shaped: no Exchange") {
    val plan = WindowChunk.slide(Tables.documents(spark, sf), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}
