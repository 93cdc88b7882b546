package graft.operators

import graft.Tables
import graft.functions.TextSim
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Classic decision-support shapes over the TPC-H-ish tables, chosen
  * because each exercises a join/aggregate shape the analytics core
  * didn't yet pin with an oracle:
  *
  *  - q_tpch_q7: a LARGE⋈LARGE join (lineitem⋈orders on orderkey)
  *    feeding TWO independent dimension decorations (supplier→nation
  *    and customer→nation) that must BOTH broadcast — a plan where
  *    accidentally shuffling a dimension is easy and expensive.
  *  - q_tpch_q14: a conditional-aggregate ratio (promo share) whose
  *    numerator and denominator ride ONE pass — the two-scans-fused
  *    discipline.
  *  - q_tpch_q3: selective filters on BOTH fact-join sides (orders
  *    before the date, lineitems shipped after it) that must reach
  *    their parquet scans as PushedFilters BEFORE the big join, then
  *    a high-cardinality group (per order) cut to top-k by
  *    TakeOrdered — the no-global-sort discipline.
  *  - q_tpch_q5: the snowflake chain (region→nation→{customer,
  *    supplier}) with the Q5 twist that the SAME nation must serve
  *    the customer AND the supplier — an extra equality that prunes
  *    the join output an order of magnitude; dims broadcast, the
  *    only shuffle is lineitem⋈orders.
  *  - q_tpch_q18: a HAVING over a fact-sized groupBy (per-order
  *    quantity mass) SEMI-filtering the same fact — the
  *    aggregate-then-rejoin shape where the winner list must stay
  *    small (broadcast back) instead of re-shuffling the fact.
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

  /** q_tpch_q3 — shipping-priority: top 10 unshipped-revenue orders
    * for one market segment (no o_shippriority in this schema —
    * o_orderpriority rides instead).
    */
  def q3Priority(s: SparkSession, d: String): DataFrame = {
    val cu = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") > lit("1997-07-01").cast("timestamp"))
      .join(Tables.orders(s, d)
        .filter(col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cu), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(TextSim.r4(TextSim.dsum(
        col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"), col("revenue"))
  }

  val q3PrioritySql: String =
    s"""SELECT o_orderkey,
       |       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       |       o_orderpriority,
       |       ${TextSim.r4Sql(TextSim.dsumSql("l_extendedprice * (1 - l_discount)"))} AS revenue
       |FROM lineitem
       |JOIN orders ON o_orderkey = l_orderkey
       |JOIN customer ON c_custkey = o_custkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1997-07-01'
       |  AND l_shipdate > TIMESTAMP '1997-07-01'
       |GROUP BY 1, 2, 3
       |ORDER BY revenue DESC, o_orderkey
       |LIMIT 10""".stripMargin

  /** q_tpch_q5 — local-supplier volume: revenue per ASIA nation where
    * the customer and the supplier share that nation.
    */
  def q5Local(s: SparkSession, d: String): DataFrame = {
    val asia = Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("nk"), col("n_name"))
    val cu = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
    val su = Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cu), col("o_custkey") === col("c_custkey"))
      .join(broadcast(su), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(asia), col("s_nationkey") === col("nk"))
      .groupBy(col("n_name"))
      .agg(TextSim.r4(TextSim.dsum(
        col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"),
        count(lit(1)).cast("long").as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5LocalSql: String =
    s"""SELECT n_name,
       |       ${TextSim.r4Sql(TextSim.dsumSql("l_extendedprice * (1 - l_discount)"))} AS revenue,
       |       count(*)::BIGINT AS n_items
       |FROM lineitem
       |JOIN orders ON o_orderkey = l_orderkey
       |JOIN customer ON c_custkey = o_custkey
       |JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
       |JOIN nation ON n_nationkey = s_nationkey
       |JOIN region ON r_regionkey = n_regionkey
       |WHERE r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1997-01-01'
       |  AND o_orderdate < TIMESTAMP '1998-01-01'
       |GROUP BY 1
       |ORDER BY revenue DESC, n_name""".stripMargin

  /** q_tpch_q18 — large-volume customers: orders whose total quantity
    * clears [[Q18MinQty]], decorated with their customer.
    */
  val Q18MinQty = 300L

  def q18Large(s: SparkSession, d: String): DataFrame = {
    val big = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).cast("long").as("total_qty"))
      .filter(col("total_qty") > Q18MinQty)
    val cu = Tables.customer(s, d).select(col("c_custkey"), col("c_name"))
    big.join(Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_totalprice")),
      col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cu), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        TextSim.r4(col("o_totalprice")).as("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  val q18LargeSql: String =
    s"""SELECT c_name, c_custkey, o_orderkey,
       |       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       |       ${TextSim.r4Sql("o_totalprice")} AS o_totalprice,
       |       total_qty
       |FROM (
       |  SELECT l_orderkey, sum(l_quantity)::BIGINT AS total_qty
       |  FROM lineitem GROUP BY l_orderkey
       |  HAVING sum(l_quantity)::BIGINT > $Q18MinQty
       |) big
       |JOIN orders ON o_orderkey = big.l_orderkey
       |JOIN customer ON c_custkey = o_custkey
       |ORDER BY o_totalprice DESC, o_orderkey
       |LIMIT 100""".stripMargin

  /** q_tpch_q10 — returned-item report: the 20 customers whose 'R'
    * returns cost the most revenue in one quarter, decorated with
    * account balance and nation. Plan shape: both fact filters
    * (return flag, order-date quarter) reach their scans; the
    * customer/nation decorations broadcast; top-20 via TakeOrdered,
    * no global sort.
    */
  def q10Returns(s: SparkSession, d: String): DataFrame = {
    val cu = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("c_nationkey"))
    val na = Tables.nation(s, d)
      .select(col("n_nationkey"), col("n_name"))
    Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R")
      .join(Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-07-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-10-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cu), col("o_custkey") === col("c_custkey"))
      .join(broadcast(na), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("n_name"))
      .agg(TextSim.r4(TextSim.dsum(
        col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"),
        count(lit(1)).cast("long").as("n_returns"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
      .select(col("c_custkey"), col("c_name"),
        TextSim.r4(col("c_acctbal")).as("c_acctbal"), col("n_name"),
        col("revenue"), col("n_returns"))
  }

  val q10ReturnsSql: String =
    s"""SELECT c_custkey, c_name,
       |       ${TextSim.r4Sql("c_acctbal")} AS c_acctbal, n_name,
       |       ${TextSim.r4Sql(TextSim.dsumSql("l_extendedprice * (1 - l_discount)"))} AS revenue,
       |       count(*)::BIGINT AS n_returns
       |FROM lineitem
       |JOIN orders ON o_orderkey = l_orderkey
       |JOIN customer ON c_custkey = o_custkey
       |JOIN nation ON n_nationkey = c_nationkey
       |WHERE l_returnflag = 'R'
       |  AND o_orderdate >= TIMESTAMP '1997-07-01'
       |  AND o_orderdate < TIMESTAMP '1997-10-01'
       |GROUP BY 1, 2, c_acctbal, 4
       |ORDER BY revenue DESC, c_custkey
       |LIMIT 20""".stripMargin

  /** Days past the order date after which a shipment counts late. */
  val Q21LateDays = 90

  /** q_tpch_q21 — suppliers-who-kept-orders-waiting, in its SCALABLE
    * aggregate form: the textbook EXISTS/NOT-EXISTS pair of fact
    * self-joins is algebraically one per-order fold — an order
    * contributes to supplier s iff s shipped late
    * (> [[Q21LateDays]] days past the order date), the order had ≥ 2
    * distinct suppliers, and s was the ONLY late one. One
    * lineitem⋈orders join, one groupBy(orderkey) with conditional
    * distinct counts, one broadcast-back of the tiny winner set —
    * versus the classic plan's TWO extra fact-sized self-join
    * shuffles. Top 20 by wait count.
    */
  def q21Waiting(s: SparkSession, d: String): DataFrame = {
    val base = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(Tables.orders(s, d)
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("late",
        col("l_shipdate") > col("o_orderdate") +
          expr(s"interval $Q21LateDays days"))
    val perOrder = base.groupBy(col("o_orderkey"))
      .agg(count_distinct(col("l_suppkey")).as("n_supps"),
        count_distinct(when(col("late"), col("l_suppkey"))).as("n_late_supps"),
        max(when(col("late"), col("l_suppkey"))).as("late_supp"))
      .filter(col("n_supps") >= 2 && col("n_late_supps") === 1)
    val su = Tables.supplier(s, d).select(col("s_suppkey"), col("s_name"))
    perOrder.groupBy(col("late_supp"))
      .agg(count(lit(1)).cast("long").as("numwait"))
      .join(broadcast(su), col("late_supp") === col("s_suppkey"))
      .select(col("s_name"), col("s_suppkey"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  val q21WaitingSql: String =
    s"""WITH base AS (
       |  SELECT l_orderkey, l_suppkey,
       |         l_shipdate > o_orderdate + INTERVAL $Q21LateDays DAY AS late
       |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
       |  WHERE o_orderstatus = 'F'
       |), per_order AS (
       |  SELECT l_orderkey,
       |         count(DISTINCT l_suppkey) AS n_supps,
       |         count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late,
       |         max(CASE WHEN late THEN l_suppkey END) AS late_supp
       |  FROM base GROUP BY 1
       |)
       |SELECT s_name, s_suppkey, count(*)::BIGINT AS numwait
       |FROM per_order JOIN supplier ON s_suppkey = late_supp
       |WHERE n_supps >= 2 AND n_late = 1
       |GROUP BY 1, 2
       |ORDER BY numwait DESC, s_name
       |LIMIT 20""".stripMargin

  /** q_grouping_sets — the CUBE readout the rollup query doesn't pin:
    * revenue and item mass over all four grouping sets of
    * (returnflag, linestatus), each row tagged with its grouping_id
    * bitmask (Spark `grouping_id()` ≡ DuckDB `GROUPING(a, b)` — first
    * argument in the high bit) and NULL grouping cells rendered
    * '<all>' so the frame totally orders. One pass, partial-agg per
    * set — the bounded 3×2 grid never shuffles more than the
    * per-partition partials.
    */
  def groupingSets(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(TextSim.r4(TextSim.dsum(
        col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"),
        sum(col("l_quantity")).cast("long").as("sum_qty"),
        count(lit(1)).cast("long").as("n_items"),
        grouping_id().cast("long").as("gid"))
      .select(coalesce(col("l_returnflag"), lit("<all>")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("<all>")).as("linestatus"),
        col("gid"), col("revenue"), col("sum_qty"), col("n_items"))
      .orderBy(col("gid"), col("returnflag"), col("linestatus"))

  val groupingSetsSql: String =
    s"""SELECT coalesce(l_returnflag, '<all>') AS returnflag,
       |       coalesce(l_linestatus, '<all>') AS linestatus,
       |       GROUPING(l_returnflag, l_linestatus)::BIGINT AS gid,
       |       ${TextSim.r4Sql(TextSim.dsumSql("l_extendedprice * (1 - l_discount)"))} AS revenue,
       |       sum(l_quantity)::BIGINT AS sum_qty,
       |       count(*)::BIGINT AS n_items
       |FROM lineitem
       |GROUP BY CUBE (l_returnflag, l_linestatus)
       |ORDER BY gid, returnflag, linestatus""".stripMargin

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
