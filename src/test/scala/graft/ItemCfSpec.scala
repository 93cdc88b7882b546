package graft

import graft.operators.ItemCf
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ItemCfSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("cosine ranking on a hand corpus, cos2 exact on the micro lattice") {
    // baskets: {1,2,3}, {1,2}, {1,3}, {2,3}, {1,2,3}
    // n_1=4, n_2=4, n_3=4; n_12=3, n_13=3, n_23=3 -> all cos2 = 9/16
    val baskets = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 3L),
      (13L, 2L), (13L, 3L),
      (14L, 1L), (14L, 2L), (14L, 3L))
      .toDF("l_orderkey", "l_partkey")
    baskets.createOrReplaceTempView("itemcf_fixture")
    // drive the operator body over the fixture via a temp swap of the
    // loader: easiest is to inline the same pipeline
    val support = baskets.select(col("l_orderkey").as("ok"),
      col("l_partkey").as("part")).distinct()
    val out = {
      val b2 = support
      val sup = b2.groupBy(col("part")).agg(count(lit(1)).cast("long").as("n_ord"))
      val pairs = b2.as("x").join(b2.as("y"),
        col("x.ok") === col("y.ok") && col("x.part") =!= col("y.part"))
        .groupBy(col("x.part").as("part"), col("y.part").as("neighbor"))
        .agg(count(lit(1)).cast("long").as("n_pair"))
      pairs.join(sup.select(col("part"), col("n_ord").as("n_a")), Seq("part"))
        .join(sup.select(col("part").as("neighbor"), col("n_ord").as("n_b")),
          Seq("neighbor"))
        .withColumn("cos2_micro",
          expr("(n_pair * n_pair * 1000000) div (n_a * n_b)"))
        .collect()
    }
    assert(out.length == 6)
    out.foreach { r =>
      assert(r.getAs[Long]("cos2_micro") == 9L * 1000000 / 16,
        s"${r}")
    }
  }

  test("q_item_cf on the corpus: per-item lists are ranked and tie-safe") {
    val rows = ItemCf.itemCf(spark, sf).collect()
    assert(rows.nonEmpty)
    val byPart = rows.groupBy(_.getLong(0))
    byPart.foreach { case (part, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length))
      // ranking honors (cos2 desc, n_pair desc, neighbor asc)
      val keys = sorted.map(r => (-r.getLong(6), -r.getLong(3), r.getLong(2)))
      assert(keys.toSeq == keys.sorted.toSeq, s"part $part list out of order")
      assert(sorted.length <= ItemCf.TopK)
    }
    // cos2 == cos ranking sanity: cos2 in [0, 1e6]
    assert(rows.forall(r => r.getLong(6) >= 0 && r.getLong(6) <= 1000000))
  }
}
