package graft

import graft.operators.RuntimeFilter
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RuntimeFilterSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("bloom-pruned join is row-identical to the plain join") {
    val big = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity"))
    val small = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_totalprice"))
    val bloomed = RuntimeFilter.bloomJoin(big, small, "l_orderkey", "o_orderkey")
    val plain = big.join(small, col("l_orderkey") === col("o_orderkey"))
    assert(bloomed.count() == plain.count())
    assert(bloomed.exceptAll(plain).isEmpty && plain.exceptAll(bloomed).isEmpty)
  }

  test("the probe prunes most non-joining big-side rows before the exchange") {
    val big = Tables.lineitem(spark, sf).select(col("l_orderkey"))
    val small = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderstatus") === "F")
      .select(col("o_orderkey"))
    val f = graft.functions.Bloom.fit(
      small.select(col("o_orderkey").cast("string").as("g")), "g", 1 << 20)
    val total = big.count()
    val kept = big.filter(
      graft.functions.Bloom.hits(array(col("l_orderkey").cast("string")), f) >= 1)
      .count()
    val trueMatch = big.join(small, col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    assert(kept >= trueMatch, "no false negatives: every joining row survives the probe")
    // at 16+ bits/key the false-positive leak-through past the true
    // matches stays small: the filter did the semi-join reduction
    assert(kept - trueMatch <= (total - trueMatch) / 20,
      s"kept=$kept trueMatch=$trueMatch total=$total")
  }

  test("auto injects the probe on a selective join, skips it on a total join, rows identical") {
    val big = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity"))
    // selective: the urgent-finished predicate keeps ~7% of orders —
    // the CMS estimate of matched fraction lands far under 0.5, so
    // auto must plant the probe without being told to
    val smallSel = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_totalprice"))
    val sel = RuntimeFilter.auto(big, smallSel, "l_orderkey", "o_orderkey")
    val selPlan = sel.queryExecution.executedPlan.toString
    val probeLine = selPlan.linesIterator.indexWhere(_.contains("bloomhits"))
    val joinLine = selPlan.linesIterator.indexWhere(_.contains("Join"))
    assert(probeLine >= 0 && joinLine >= 0 && joinLine < probeLine,
      "selective join: probe present, below the join")
    val plainSel = big.join(smallSel, col("l_orderkey") === col("o_orderkey"))
    assert(sel.exceptAll(plainSel).isEmpty && plainSel.exceptAll(sel).isEmpty)

    // non-selective: every order joins — the probe would tax every
    // row and prune nothing; auto must emit the plain join
    val smallAll = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice"))
    val all = RuntimeFilter.auto(big, smallAll, "l_orderkey", "o_orderkey")
    assert(!all.queryExecution.executedPlan.toString.contains("bloomhits"),
      "total join: no probe injected")
    val plainAll = big.join(smallAll, col("l_orderkey") === col("o_orderkey"))
    assert(all.exceptAll(plainAll).isEmpty && plainAll.exceptAll(all).isEmpty)
  }

  test("the bloom probe sits in the scan stage, below the join") {
    val plan = RuntimeFilter.bloomJoinQuery(spark, sf)
      .queryExecution.executedPlan.toString
    val probeLine = plan.linesIterator.indexWhere(_.contains("bloomhits"))
    val joinLine = plan.linesIterator.indexWhere(_.contains("Join"))
    assert(probeLine >= 0, "bloom probe present")
    assert(joinLine >= 0 && joinLine < probeLine,
      "probe evaluates upstream (deeper in the tree) of the join")
  }
}
