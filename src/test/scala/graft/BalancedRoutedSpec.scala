package graft

import graft.operators.{Ann, KMeansVec}
import graft.sources.IndexStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Balance-aware two-level routing: leaf budget allocated to top cells
  * by mass. The corpus is deliberately SKEWED — most vectors pulled
  * tightly toward one anchor — so uniform per-cell kSub wastes leaves
  * on near-empty cells while the hot cell's lists bloat.
  */
class BalancedRoutedSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.01"
  private val Dim = 64
  private val KTop = 4
  private val KSubMax = 8
  private val Budget = 16 // == uniform KTop * kSub(4): same leaf spend

  /** ~80% of vectors mixed 97:3 toward the lowest-id vector: one tight
    * hot cluster plus a diffuse 20% tail.
    */
  private lazy val skewed: DataFrame = {
    val base = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val anchor = typedLit(
      base.orderBy("vec_id").limit(1).collect()(0).getSeq[Float](1))
    base.select(col("vec_id"),
      when(col("vec_id") % 5 =!= 0,
        zip_with(anchor, col("embedding"),
          (a, b) => (a * lit(0.97f)) + (b * lit(0.03f))))
        .otherwise(col("embedding")).as("embedding"))
  }

  private def topOf(centId: Long, grid: Int): Long = (centId - 1) / grid + 1

  test("mass-proportional allocation bounds expected list size under skew") {
    val (topB, leavesB) =
      KMeansVec.fitRoutedBalanced(skewed, KTop, KSubMax, Budget, iters = 2)
    val (_, leavesU) = KMeansVec.fitRouted(skewed, KTop, Budget / KTop, iters = 2)

    val e = skewed.withColumn("nrm", Ann.norm(col("embedding")))
    val cellMass = KMeansVec.assign(e, topB)
      .groupBy("cent_id").count()
      .as[(Long, Long)].collect().toMap

    val leafB = leavesB.select("cent_id").as[Long].collect()
    val perCellB = leafB.groupBy(topOf(_, KSubMax)).view.mapValues(_.length).toMap
    // grid validity: every leaf belongs to a live top cell, none
    // exceeds its kSubMax slot range
    assert(leafB.forall(id => cellMass.contains(topOf(id, KSubMax))))
    assert(perCellB.values.forall(_ <= KSubMax))
    // the allocator spends the budget exactly: capped hot-cell surplus
    // is re-dealt to cells with headroom, never stranded (the only
    // shortfall is every cell capped at min(kSubMax, mass))
    val capSum = cellMass.values.map(m => math.min(KSubMax.toLong, m)).sum
    assert(leafB.length == math.max(cellMass.size.toLong,
      math.min(Budget.toLong, capSum)), s"spent ${leafB.length} of $Budget")

    val hot = cellMass.maxBy(_._2)._1
    val coldCells = cellMass.keySet - hot
    // the hot cell earns strictly more leaves than any cold cell
    assert(coldCells.forall(c => perCellB.getOrElse(c, 0) < perCellB(hot)),
      s"hot $hot leaves=$perCellB mass=$cellMass")

    // EXPECTED list size (cell mass / cell leaves): the balanced max
    // must not exceed the uniform max on the same assignment
    val uniformMax = cellMass.values.map(_.toDouble / (Budget / KTop)).max
    val balancedMax = cellMass.map { case (c, m) =>
      m.toDouble / perCellB.getOrElse(c, 1)
    }.max
    assert(balancedMax <= uniformMax,
      s"balanced $balancedMax vs uniform $uniformMax")
    assert(leavesU.count() > 0) // uniform baseline trained on same data
  }

  test("IndexStore routeBudget build serves through the unchanged routed path") {
    val pB = java.nio.file.Files.createTempDirectory("graft_balanced_").toString
    val pU = java.nio.file.Files.createTempDirectory("graft_uniform_").toString
    IndexStore.build(skewed, pB, Dim, nlist = KTop * KSubMax, m = 8,
      kcode = 16, iters = 2, routeTop = KTop, routeBudget = Budget)
    IndexStore.build(skewed, pU, Dim, nlist = Budget, m = 8,
      kcode = 16, iters = 2, routeTop = KTop)
    val queries = skewed.filter(col("vec_id") % 100 === 0)
    val hB = IndexStore.open(spark, pB)
    val got = hB.search(queries, k = 10, nprobe = 4, routeWidth = 2)
    val plan = got.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cent_id".r.findFirstIn(plan).isDefined,
      s"balanced store must still partition-prune probes:\n$plan")
    assert(got.groupBy("query_id").count().as[(Long, Long)].collect()
      .forall(_._2 == 10L))
    // recall-vs-exact is noise on a near-degenerate corpus (r6 cosine
    // ties dominate), so compare stores: at FULL probe width both scan
    // every leaf through identical ADC machinery — the balanced
    // centroid layout must not lose ground to the uniform one it
    // replaces (same 16-leaf spend)
    val truth = Ann.topKNeighbors(spark, skewed, queries, k = 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    def recall(h: IndexStore.Handle, nlist: Int): Double = {
      val got = h.search(queries, k = 10, nprobe = nlist, routeWidth = KTop)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
      (truth & got).size.toDouble / truth.size
    }
    val rB = recall(hB, KTop * KSubMax)
    val rU = recall(IndexStore.open(spark, pU), Budget)
    assert(rB >= rU - 0.05, s"balanced $rB vs uniform $rU")
  }
}
