package graft.operators

import graft.Tables
import graft.functions.{Bloom, TextSim}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Runtime-filter join: prune the BIG side of an equi-join with a
  * Bloom filter of the small side's join keys BEFORE the join's
  * exchange — the classic bloom-join / semi-join reduction (Bratbergsengen
  * VLDB'84; Spark's own AQE runtime filters are this idea applied by
  * the optimizer). When a selective dimension predicate means most
  * fact rows will never find a partner, the plain plan still SHUFFLES
  * every fact row to discover that; the bloom probe rejects them at
  * the scan, so shuffle volume (the 100 TB cost term) drops to
  * ~|matching| + ε·|big|.
  *
  * Correctness is unconditional: the filter admits every true key (no
  * false negatives — [[Bloom]]'s asserted contract), and the join
  * itself removes the ε false positives — so the result is EXACTLY
  * the plain join, which is how the oracle verifies it. The filter is
  * bits-bounded (never |small| rows of state): at GB-scale small
  * sides the m-bit array still rides to tasks as one reference
  * object.
  */
object RuntimeFilter {

  /** Inner equi-join with the big side bloom-pruned before the
    * exchange. `mBits` sizes the filter (rounded up to a power of two
    * by `fit`); at ~16 bits per small-side key the FP leak-through is
    * < 2%.
    */
  def bloomJoin(big: DataFrame, small: DataFrame, bigKey: String,
    smallKey: String, mBits: Int = 1 << 20): DataFrame = {
    val f = Bloom.fit(
      small.select(col(smallKey).cast("string").as("g")), "g", mBits)
    big.filter(Bloom.hits(array(col(bigKey).cast("string")), f) >= 1)
      .join(small, col(bigKey) === col(smallKey))
  }

  /** Optimizer-shaped form: decide FROM STATISTICS whether the probe
    * pays, then inject it — the two demonstrated primitives
    * ([[JoinCard]] estimation + [[bloomJoin]]) composed into the tool
    * a user calls without hand-wiring either. The decision signal is
    * the estimated matched fraction est_pairs / |big| from the CMS
    * inner product ([[JoinCard.estimate]] — never undercounts, so a
    * skipped probe is never skipped because the estimate lied low;
    * only FP overcount can make `auto` conservative): below
    * `maxSelectivity`, most big rows have no partner and the probe
    * deletes their shuffle; above it, the probe would tax every row
    * for little pruning, so the plain join wins.
    *
    * Planning cost: one CMS fold per side, period — |big| reads off
    * the big side's OWN counter frame (any single CMS row's counters
    * sum to the total insertion count), so planning never runs a
    * separate `count()` pass; est and n_big land in ONE 1-row collect
    * (the ≤512-collect class). NOTE the planning fold is still EAGER:
    * calling `auto` runs one Spark job per side at call time, and the
    * big side is then scanned again by whichever join is chosen. At
    * 100 TB both sides' counters come PRE-COMPUTED from storage (they
    * are mergeable ingest statistics, the `bm25Stats` contract), so
    * the decision is storage-stat-only, exactly like a cost-based
    * optimizer's. Result is row-identical to `big ⋈ small` either
    * way (asserted in RuntimeFilterSpec both branches).
    */
  /** Counter width for the [[auto]] decision: the CMS inner product
    * overcounts by ~|big|·|small|/width, so width must dominate the
    * small side's key count or collision noise alone pushes the
    * estimated match fraction past any threshold (the default
    * [[graft.functions.Cms.Width]] of 512 is sized for q_join_card's
    * order-of-magnitude answers, not this decision). 2¹⁷ counters =
    * 1 MB/side — still a bits-bounded planning statistic; size it to
    * ≳ 10× the small side's distinct keys at scale.
    */
  val AutoWidth: Long = 1L << 17

  def auto(big: DataFrame, small: DataFrame, bigKey: String,
    smallKey: String, maxSelectivity: Double = 0.5,
    mBits: Int = 1 << 20): DataFrame = {
    val cBig = JoinCard.counters(big.select(col(bigKey)), bigKey,
      width = AutoWidth).persist()
    val cSmall = JoinCard.counters(small.select(col(smallKey)), smallKey,
      width = AutoWidth)
    // one collect: inner-product estimate + |big| from the counters
    // themselves (row 0's counters sum to the insertion total)
    val row = JoinCard.estimate(cBig, cSmall)
      .crossJoin(cBig.filter(col("r") === 0)
        .agg(coalesce(sum(col("c")), lit(0L)).as("n_big")))
      .head
    cBig.unpersist()
    val est = if (row.isNullAt(0)) 0L else row.getLong(0)
    val nBig = row.getLong(1)
    if (nBig > 0 && est.toDouble / nBig <= maxSelectivity)
      bloomJoin(big, small, bigKey, smallKey, mBits)
    else big.join(small, col(bigKey) === col(smallKey))
  }

  /** q_bloom_join — lineitem revenue of urgent finished orders: the
    * orders predicate keeps ~10% of orders, so ~90% of lineitem rows
    * have no partner; the bloom probe drops them before the join
    * shuffle. Result (and oracle) are the plain join — the filter is
    * a pure execution-strategy choice, invisible in the answer.
    */
  def bloomJoinQuery(s: SparkSession, d: String): DataFrame = {
    val small = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderstatus") === "F")
      .select(col("o_orderkey"))
    val big = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
    bloomJoin(big, small, "l_orderkey", "o_orderkey")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        TextSim.r4(TextSim.dsum(col("l_quantity"))).as("sum_qty"),
        TextSim.r4(TextSim.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue"))
      .orderBy(col("l_returnflag"))
  }

  val bloomJoinSql: String =
    s"""SELECT l_returnflag,
       |       count(*)::BIGINT AS n_items,
       |       ${TextSim.r4Sql(TextSim.dsumSql("l_quantity"))} AS sum_qty,
       |       ${TextSim.r4Sql(TextSim.dsumSql("l_extendedprice * (1 - l_discount)"))} AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'
       |GROUP BY l_returnflag
       |ORDER BY l_returnflag""".stripMargin
}
