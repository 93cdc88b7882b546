package graft

import graft.operators.{Ann, Mrr}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MrrSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** Unit vectors at the given angles (degrees), so cosine similarity
    * orders neighbors by angular distance from the query at 0 deg.
    */
  private def vecs(rows: Seq[(Long, Double, Long)]): DataFrame =
    rows.map { case (id, deg, lbl) =>
      val r = math.toRadians(deg)
      (id, Array(math.cos(r).toFloat, math.sin(r).toFloat), lbl)
    }.toDF("vec_id", "embedding", "label")
      .withColumn("nrm", Ann.norm(col("embedding")))

  test("first relevant at rank 2 behind a closer irrelevant: rr = 500000") {
    val e = vecs(Seq(
      (0L, 0.0, 1L),   // query
      (1L, 5.0, 2L),   // closest, wrong label -> rank 1
      (2L, 10.0, 1L),  // first same-label -> rank 2
      (3L, 40.0, 2L)))
    val r = Mrr.mrrOf(e, e.filter(col("vec_id") === 0L)).collect().head
    assert(r.getAs[Long]("n_covered") == 1L)
    assert(r.getAs[Long]("mean_rr_micro") == 500000L)
    assert(r.getAs[Long]("recall10_micro") == 1000000L)
  }

  test("immediate hit: rank 1, perfect MRR") {
    val e = vecs(Seq((0L, 0.0, 1L), (1L, 5.0, 1L), (2L, 10.0, 2L)))
    val r = Mrr.mrrOf(e, e.filter(col("vec_id") === 0L)).collect().head
    assert(r.getAs[Long]("mean_rr_micro") == 1000000L)
  }

  test("orphan query (singleton label) is excluded, not scored zero") {
    val e = vecs(Seq(
      (0L, 180.0, 9L), // query with a unique label, far from the rest
      (10L, 0.0, 1L),  // second query, has a relevant twin
      (1L, 5.0, 1L), (2L, 10.0, 2L)))
    val r = Mrr.mrrOf(e, e.filter(col("vec_id") % 10 === 0)).collect().head
    assert(r.getAs[Long]("n_queries") == 2L)
    assert(r.getAs[Long]("n_covered") == 1L)
    assert(r.getAs[Long]("n_orphans") == 1L)
    assert(r.getAs[Long]("mean_rr_micro") == 1000000L)
  }

  test("mean over queries: ranks 1 and 4 give (1e6 + 250000) div 2") {
    val e = vecs(Seq(
      (0L, 0.0, 1L), (1L, 5.0, 1L),               // q0: hit at rank 1
      (10L, 90.0, 3L),                             // q10: three closer wrong
      (11L, 85.0, 4L), (12L, 80.0, 4L), (13L, 95.0, 4L),
      (14L, 70.0, 3L)))                            // q10's twin at rank 4
    val r = Mrr.mrrOf(e, e.filter(col("vec_id") % 10 === 0)).collect().head
    assert(r.getAs[Long]("n_covered") == 2L)
    assert(r.getAs[Long]("mean_rr_micro") == (1000000L + 250000L) / 2L)
    assert(r.getAs[Long]("recall10_micro") == 1000000L)
  }
}
