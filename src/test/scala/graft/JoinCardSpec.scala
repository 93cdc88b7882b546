package graft

import graft.functions.Cms
import graft.operators.JoinCard
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class JoinCardSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("estimates never undercount; collision inflation stays inside the CMS bound") {
    val rows = JoinCard.joinCard(spark, sf)
      .select(col("join_name"), col("est_pairs"), col("exact_pairs"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    rows.foreach { case (name, (est, exact)) =>
      assert(est >= exact, s"$name undercounts: $est < $exact")
    }
    // per-row error ≤ (e/width)·|A|·|B| w.h.p.; min over depth rows
    val nL = Tables.lineitem(spark, sf).count()
    val nO = Tables.orders(spark, sf).count()
    val (est, exact) = rows("lineitem_orders")
    assert(est - exact <= (math.E / Cms.Width) * nL * nO,
      s"inflation $est-$exact exceeds the CMS bound")
  }

  test("counter frames merge by addition (incremental planning state)") {
    val keys = Tables.lineitem(spark, sf).select(col("l_orderkey"))
    val one = JoinCard.counters(keys, "l_orderkey")
      .as[(Int, Long, Long)].collect().toSet
    val a = JoinCard.counters(keys.filter(col("l_orderkey") % 2 === 0), "l_orderkey")
    val b = JoinCard.counters(keys.filter(col("l_orderkey") % 2 =!= 0), "l_orderkey")
    val merged = a.unionByName(b)
      .groupBy(col("r"), col("b")).agg(sum(col("c")).as("c"))
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == one, "merged per-batch counters must equal one-shot")
  }

  test("self inner product is the F2 skew diagnostic: skewed >> uniform at equal size") {
    val uniform = (1L to 512L).map(i => Tuple1(i)).toDF("k")
    val skewed = Seq.fill(512)(Tuple1(7L)).toDF("k")
    def f2(df: org.apache.spark.sql.DataFrame): Long = {
      val c = JoinCard.counters(df, "k")
      JoinCard.estimate(c, c).as[Long].head()
    }
    assert(f2(skewed) == 512L * 512L, "one hot key: F2 = n^2 exactly")
    assert(f2(uniform) < f2(skewed) / 50,
      "uniform keys must look nothing like a hot key")
  }
}
