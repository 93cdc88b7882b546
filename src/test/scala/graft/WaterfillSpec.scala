package graft

import graft.operators.Waterfill
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WaterfillSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** Sequential reference: λ* by linear scan, remainder to the first
    * uncapped domains in source order.
    */
  private def ref(doms: Seq[(String, Long)]): Map[String, Long] = {
    val total = doms.map(_._2).sum
    val budget = total * Waterfill.BudgetNum / Waterfill.BudgetDen
    def cost(lam: Long) = doms.map(d => math.min(d._2, lam)).sum
    var lam = 0L
    while (cost(lam + 1) <= budget) lam += 1
    val base = doms.map { case (s, n) => s -> math.min(n, lam) }.toMap
    var r = budget - base.values.sum
    val topped = scala.collection.mutable.Map(base.toSeq: _*)
    for ((s, n) <- doms.sortBy(_._1) if n > lam && r > 0) {
      topped(s) += 1; r -= 1
    }
    topped.toMap
  }

  test("allocation matches the sequential reference on random domain mixes") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 5) {
      val doms = (1 to rnd.nextInt(8) + 3).map(i =>
        f"s$i%02d" -> (rnd.nextInt(5000) + 1).toLong)
      val got = Waterfill.allocate(doms.toDF("source", "n_tokens"))
        .select(col("source"), col("alloc")).as[(String, Long)]
        .collect().toMap
      assert(got == ref(doms), s"trial $trial: $doms")
    }
  }

  test("exact spend, no upsampling, near-uniform uncapped allocations") {
    val doms = Seq(("a", 100L), ("b", 2000L), ("c", 3000L), ("d", 50L),
      ("e", 7000L))
    val total = doms.map(_._2).sum
    val budget = total * Waterfill.BudgetNum / Waterfill.BudgetDen
    val got = Waterfill.allocate(doms.toDF("source", "n_tokens"))
      .select(col("source"), col("n_tokens"), col("alloc"), col("capped"))
      .as[(String, Long, Long, Boolean)].collect()
    assert(got.map(_._3).sum == budget, "budget must be spent exactly")
    assert(got.forall(r => r._3 <= r._2), "never upsample")
    val capped = got.filter(_._4).map(_._3)
    assert(capped.nonEmpty && capped.max - capped.min <= 1,
      s"capped domains sit on the waterline: ${got.mkString(",")}")
    // small domains kept whole
    assert(got.filter(r => !r._4).forall(r => r._3 == r._2))
  }

  test("degenerate single domain: capped exactly at the budget") {
    val got = Waterfill.allocate(Seq(("only", 10L)).toDF("source", "n_tokens"))
      .select(col("alloc"), col("capped")).as[(Long, Boolean)].head()
    assert(got == ((6L, true)), "one domain absorbs the whole 60% budget")
  }

  test("q_waterfill spends the corpus budget exactly at sf0.001") {
    val out = Waterfill.waterfill(spark, sf)
    val (spent, avail) = out.agg(sum(col("alloc")), sum(col("n_tokens")))
      .as[(Long, Long)].head()
    assert(spent == avail * Waterfill.BudgetNum / Waterfill.BudgetDen,
      s"spent $spent of $avail")
  }

  test("the corpus folds once: every branch reads the persisted stats frame") {
    val q = Waterfill.waterfill(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"),
      "allocation branches must read the stats barrier, not re-fold the corpus")
    spark.catalog.clearCache()
  }
}
