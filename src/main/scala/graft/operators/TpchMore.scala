package graft.operators

import graft.Tables
import graft.functions.TextSim
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Two more classic decision-support shapes over the TPC-H-ish
  * tables — the cross-nation trade flow (Q7) and the promo revenue
  * share (Q14), chosen because each exercises a join/aggregate shape
  * the analytics core didn't yet pin with an oracle:
  *
  *  - q_tpch_q7: a LARGE⋈LARGE join (lineitem⋈orders on orderkey)
  *    feeding TWO independent dimension decorations (supplier→nation
  *    and customer→nation) that must BOTH broadcast — a plan where
  *    accidentally shuffling a dimension is easy and expensive.
  *  - q_tpch_q14: a conditional-aggregate ratio (promo share) whose
  *    numerator and denominator ride ONE pass — the two-scans-fused
  *    discipline.
  *
  * Revenue is the house exact form: decimal(20,6) sums (partial-agg,
  * map-side) rounded once at the edge (r4/r6 — both engines share the
  * literal rounding).
  */
object TpchMore {

  /** q_tpch_q7 — volume shipped between every (supplier nation,
    * customer nation) pair with supp ≠ cust, by ship year.
    */
  def q7Volume(s: SparkSession, d: String): DataFrame = {
    val n1 = Tables.nation(s, d)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, d)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    val su = Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
    val cu = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cu), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      // keep the pair census small but real: 5 supplier nations
      .filter(col("s_nationkey") < 5)
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(TextSim.r4(TextSim.dsum(
        col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"),
        count(lit(1)).cast("long").as("n_items"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  val q7VolumeSql: String =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |       year(l_shipdate)::BIGINT AS l_year,
       |       ${TextSim.r4Sql(TextSim.dsumSql("l_extendedprice * (1 - l_discount)"))} AS revenue,
       |       count(*)::BIGINT AS n_items
       |FROM lineitem
       |JOIN orders ON o_orderkey = l_orderkey
       |JOIN supplier ON s_suppkey = l_suppkey
       |JOIN customer ON c_custkey = o_custkey
       |JOIN nation n1 ON n1.n_nationkey = s_nationkey
       |JOIN nation n2 ON n2.n_nationkey = c_nationkey
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
       |  AND l_shipdate < TIMESTAMP '1998-01-01'
       |  AND n1.n_name <> n2.n_name
       |  AND s_nationkey < 5
       |GROUP BY 1, 2, 3
       |ORDER BY 1, 2, 3""".stripMargin

  /** q_tpch_q14 — promo revenue share by ship month: numerator and
    * denominator in ONE conditional-aggregate pass.
    */
  def q14Promo(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d).select(col("p_partkey"), col("p_type"))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
      .agg(
        TextSim.r4(TextSim.dsum(when(col("p_type") === "PROMO",
          col("l_extendedprice") * (lit(1) - col("l_discount")))
          .otherwise(lit(0)))).as("promo_revenue"),
        TextSim.r4(TextSim.dsum(
          col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("total_revenue"),
        count(lit(1)).cast("long").as("n_items"))
      .withColumn("promo_share", TextSim.r6(
        col("promo_revenue") / col("total_revenue")))
      .orderBy(col("ship_month"))
  }

  val q14PromoSql: String = {
    val promo = TextSim.r4Sql(TextSim.dsumSql(
      "CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END"))
    val total = TextSim.r4Sql(TextSim.dsumSql("l_extendedprice * (1 - l_discount)"))
    s"""SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
       |       $promo AS promo_revenue,
       |       $total AS total_revenue,
       |       count(*)::BIGINT AS n_items,
       |       ${TextSim.r6Sql(s"($promo) / ($total)")} AS promo_share
       |FROM lineitem JOIN part ON p_partkey = l_partkey
       |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
       |  AND l_shipdate < TIMESTAMP '1998-01-01'
       |GROUP BY 1
       |ORDER BY 1""".stripMargin
  }
}
