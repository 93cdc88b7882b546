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
