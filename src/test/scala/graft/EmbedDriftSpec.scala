package graft

import graft.operators.{Ann, CorpusStats}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EmbedDriftSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def cents(of: org.apache.spark.sql.DataFrame) =
    of.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("c_emb"),
        col("nrm").as("c_nrm"))

  test("identical slices drift to zero in every cluster") {
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
      .withColumn("nrm", Ann.norm(col("embedding")))
    // same vectors on both sides: duplicate each row into both slices
    val both = e.withColumn("is_ref", lit(true))
      .unionByName(e.withColumn("is_ref", lit(false)))
    val rep = CorpusStats.embedDrift(both, cents(e))
    assert(rep.select(max(abs(col("llr_micro")))).as[Long].head() == 0L)
    assert(rep.select(max(abs(col("jsd_micro")))).as[Double].head() == 0.0)
  }

  test("a topic removed from one slice lights up its cluster") {
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
      .withColumn("nrm", Ann.norm(col("embedding")))
    val cs = cents(e)
    // slice b drops every vector assigned to the first centroid
    val assigned = e.withColumn("nc",
      graft.functions.NearestCentroids.fromFrame(col("embedding"), cs, 1))
      .withColumn("cent_id", element_at(col("nc"), 1).getField("cent_id"))
    val firstCent = cs.select(min(col("cent_id"))).as[Long].head()
    val both = assigned.withColumn("is_ref", lit(true))
      .unionByName(assigned.filter(col("cent_id") =!= firstCent)
        .withColumn("is_ref", lit(false)))
      .select(col("vec_id"), col("embedding"), col("is_ref"))
    val rep = CorpusStats.embedDrift(both, cs).persist()
    val hot = rep.filter(col("cent_id") === firstCent).collect().head
    assert(hot.getAs[Long]("cb") == 0L)
    assert(hot.getAs[Long]("llr_micro") > 0L, "removed topic: ref-heavy log ratio")
    // the emptied cluster carries the largest JSD contribution
    val top = rep.orderBy(col("jsd_micro").desc).select(col("cent_id"))
      .as[Long].head()
    assert(top == firstCent)
    rep.unpersist()
  }

  test("JSD total is bounded by ln 2 and every cell is non-negative") {
    val rep = CorpusStats.embedDriftQuery(spark, sf).collect()
    val cells = rep.map(_.getAs[Double]("jsd_micro"))
    assert(cells.forall(_ >= 0.0))
    assert(cells.sum <= math.log(2) * 1e6 + 1.0)
  }
}
