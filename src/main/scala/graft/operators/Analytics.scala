package graft.operators

import graft.Tables
import graft.functions.TextSim
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational analytics over the TPC-H-ish tables: aggregation,
  * multi-way joins (small dims broadcast), window top-k, sessionization.
  *
  * Scale notes per query inline. All doubles rounded identically to the
  * DuckDB oracle; every result totally ordered for stable hashing.
  */
object Analytics {

  /** Pricing summary (TPC-H Q1 shape). One scan + one partial-agg
    * friendly groupBy on a low-cardinality key: at 100 TB this is
    * map-side combine into 6 groups — shuffle is bytes, not rows.
    * Filter + 7-column projection push to the parquet scan.
    */
  def q1Agg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        // dsum everywhere: exact decimal accumulation, so the rounded
        // result can't flip with partition/merge order (avg = dsum/count
        // for the same reason — avg(double) is order-sensitive too)
        TextSim.r4(TextSim.dsum(col("l_quantity"))).as("sum_qty"),
        TextSim.r4(TextSim.dsum(col("l_extendedprice"))).as("sum_base_price"),
        TextSim.r4(TextSim.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
        TextSim.r4(TextSim.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))).as("sum_charge"),
        TextSim.r6(TextSim.dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        TextSim.r6(TextSim.dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        TextSim.r6(TextSim.dsum(col("l_discount")) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q1AggSql: String =
    s"""SELECT l_returnflag, l_linestatus,
      |       ${TextSim.r4Sql(TextSim.dsumSql("l_quantity"))} AS sum_qty,
      |       ${TextSim.r4Sql(TextSim.dsumSql("l_extendedprice"))} AS sum_base_price,
      |       ${TextSim.r4Sql(TextSim.dsumSql("l_extendedprice * (1 - l_discount)"))} AS sum_disc_price,
      |       ${TextSim.r4Sql(TextSim.dsumSql("l_extendedprice * (1 - l_discount) * (1 + l_tax)"))} AS sum_charge,
      |       ${TextSim.r6Sql(TextSim.dsumSql("l_quantity") + " / count(*)")} AS avg_qty,
      |       ${TextSim.r6Sql(TextSim.dsumSql("l_extendedprice") + " / count(*)")} AS avg_price,
      |       ${TextSim.r6Sql(TextSim.dsumSql("l_discount") + " / count(*)")} AS avg_disc,
      |       count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Shipping-priority top-N (TPC-H Q3 shape). customer is tiny →
    * broadcast; orders⋈lineitem is the one real shuffle, on orderkey.
    * Top-10 by (revenue desc, key) — deterministic total order.
    */
  def q3TopN(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, d).filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
    val l = Tables.lineitem(s, d).filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(TextSim.r4(TextSim.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
      .select(col("l_orderkey"), col("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3TopNSql: String =
    s"""SELECT l_orderkey,
      |       ${TextSim.r4Sql(TextSim.dsumSql("l_extendedprice * (1 - l_discount)"))} AS revenue,
      |       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
      |       o_orderpriority
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING'
      |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1998-03-15'
      |  AND l_shipdate > TIMESTAMP '1998-03-15'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** Local-supplier revenue by nation (TPC-H Q5 shape): 6-way join.
    * region/nation/supplier/customer are dimension-sized → broadcast;
    * the only large-large join (orders⋈lineitem) shuffles on orderkey.
    */
  def q5Region(s: SparkSession, d: String): DataFrame = {
    val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
    val n = Tables.nation(s, d)
    val c = Tables.customer(s, d)
    val su = Tables.supplier(s, d)
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val l = Tables.lineitem(s, d)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(c),
        col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(TextSim.r4(TextSim.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5RegionSql: String =
    s"""SELECT n_name,
      |       ${TextSim.r4Sql(TextSim.dsumSql("l_extendedprice * (1 - l_discount)"))} AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** q_rollup — multi-level pricing summary via ROLLUP grouping sets:
    * (flag, status), (flag), and grand total in ONE pass — partial-agg
    * friendly like q1 (the rollup expands map-side; the shuffle still
    * carries a handful of groups). Null grouping cells are projected to
    * 'ALL' so both engines order and hash identically.
    */
  def rollupSummary(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"),
        TextSim.r4(TextSim.dsum(col("l_quantity"))).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
        col("n_rows"), col("sum_qty"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val rollupSummarySql: String =
    s"""SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
       |       coalesce(l_linestatus, 'ALL') AS l_linestatus,
       |       count(*) AS n_rows,
       |       ${TextSim.r4Sql(TextSim.dsumSql("l_quantity"))} AS sum_qty
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       |GROUP BY ROLLUP (l_returnflag, l_linestatus)
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q_exists — semi/anti-join shapes (EXISTS / NOT EXISTS): BUILDING
    * customers who placed at least one order but never an URGENT one.
    * Left-semi and left-anti joins shuffle on custkey and never
    * materialize the probe side's payload — the set-membership pattern
    * every incremental pipeline uses (the upsert sink is built on the
    * same anti-join).
    */
  def existsAnti(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, d)
    c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .join(o.filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  val existsAntiSql: String =
    """SELECT c_custkey, c_name
      |FROM customer c
      |WHERE c_mktsegment = 'BUILDING'
      |  AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      |                  AND o.o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  /** Top-3 parts per brand by retail price: window row_number, single
    * shuffle on the partition key. At scale: rank within partitions is
    * sort-based; low-cardinality brand keys would salt if skewed.
    */
  def windowTopK(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    Tables.part(s, d)
      // cast to long: row_number() is int in Spark but BIGINT in the
      // DuckDB oracle; a driver that fetches via pandas would see
      // int32 vs int64 (and worse, HUGEINT aggregates become float64)
      .withColumn("rank_in_brand", row_number().over(w).cast("long"))
      .filter(col("rank_in_brand") <= 3)
      .select(col("p_brand"), col("rank_in_brand"), col("p_partkey"),
        col("p_name"), TextSim.r4(col("p_retailprice")).as("p_retailprice"))
      .orderBy(col("p_brand"), col("rank_in_brand"))
  }

  val windowTopKSql: String =
    """SELECT p_brand, rank_in_brand, p_partkey, p_name, p_retailprice
      |FROM (
      |  SELECT p_brand, p_partkey, p_name, floor((p_retailprice) * 10000.0 + 0.5) / 10000.0 AS p_retailprice,
      |         row_number() OVER (PARTITION BY p_brand
      |                            ORDER BY p_retailprice DESC, p_partkey) AS rank_in_brand
      |  FROM part)
      |WHERE rank_in_brand <= 3
      |ORDER BY p_brand, rank_in_brand""".stripMargin

  /** Hourly tumbling-window event aggregate — the batch mirror of
    * [[graft.streaming.StreamingHourly]]. Group key (hour, type) is
    * partial-agg friendly.
    */
  def eventsHourly(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        TextSim.r4(TextSim.dsum(col("value"))).as("sum_value"),
        count_distinct(col("user_id")).as("n_users"))
      .orderBy(col("hour"), col("event_type"))

  val eventsHourlySql: String =
    s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
      |       event_type,
      |       count(*) AS n_events,
      |       ${TextSim.r4Sql(TextSim.dsumSql("value"))} AS sum_value,
      |       count(DISTINCT user_id) AS n_users
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY hour, event_type""".stripMargin

  /** q_quantiles — exact discrete order statistics (p50/p95 of value
    * per event_type): rank rows per group with a total order
    * (value, event_id tiebreak), pick rank ceil(p·n). Exact and
    * engine-identical, unlike interpolated percentile_cont whose
    * formula differs across engines, or approx_percentile whose sketch
    * isn't comparable at all. Cost model: one per-group window sort —
    * the exact-answer price; at 100 TB the scale path is
    * approx_percentile and this query is the accuracy oracle for it.
    */
  def quantiles(s: SparkSession, d: String): DataFrame = {
    val byType = Window.partitionBy(col("event_type"))
    val w = byType.orderBy(col("value"), col("event_id"))
    Tables.events(s, d)
      .select(col("event_type"), col("value"), col("event_id"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(byType))
      .groupBy(col("event_type"))
      .agg(
        TextSim.r6(max(when(col("rn") === ceil(col("n") * lit(0.5)), col("value")))).as("p50"),
        TextSim.r6(max(when(col("rn") === ceil(col("n") * lit(0.95)), col("value")))).as("p95"),
        max(col("n")).as("n_events"))
      .orderBy(col("event_type"))
  }

  val quantilesSql: String =
    s"""WITH ranked AS (
       |  SELECT event_type, value,
       |         row_number() OVER (PARTITION BY event_type
       |                            ORDER BY value, event_id) AS rn,
       |         count(*) OVER (PARTITION BY event_type) AS n
       |  FROM events
       |)
       |SELECT event_type,
       |       ${TextSim.r6Sql("max(CASE WHEN rn = ceil(n * 0.5) THEN value END)")} AS p50,
       |       ${TextSim.r6Sql("max(CASE WHEN rn = ceil(n * 0.95) THEN value END)")} AS p95,
       |       max(n) AS n_events
       |FROM ranked
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin

  /** Sessionization: 30-min inactivity gap splits a user's events into
    * sessions (lag + running count of gap-starts), then per-session agg.
    * One shuffle on user_id; the window sort is within-partition. The
    * streaming twin is [[graft.streaming.StreamingSessionize]].
    */
  def sessionize(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1).otherwise(0))
      .withColumn("session_seq",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        TextSim.r4(TextSim.dsum(col("value"))).as("sum_value"),
        min(col("event_id")).as("first_event"),
        max(col("event_id")).as("last_event"))
      .orderBy(col("user_id"), col("session_seq"))
  }

  val sessionizeSql: String =
    s"""WITH marked AS (
      |  SELECT user_id, event_id, value, ts,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), sessions AS (
      |  SELECT user_id, event_id, value,
      |         (sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                                 ROWS UNBOUNDED PRECEDING))::BIGINT AS session_seq
      |  FROM marked
      |)
      |SELECT user_id, session_seq, count(*) AS n_events,
      |       ${TextSim.r4Sql(TextSim.dsumSql("value"))} AS sum_value,
      |       min(event_id) AS first_event, max(event_id) AS last_event
      |FROM sessions
      |GROUP BY user_id, session_seq
      |ORDER BY user_id, session_seq""".stripMargin

  /** The event-type domain is part of the REPORT SCHEMA, not data: a
    * pivot whose columns depend on a distinct-scan needs an extra job
    * and yields a run-dependent schema — the fixed list keeps the pivot
    * one pass and the output schema stable (the production form of any
    * scheduled pivot report).
    */
  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  /** q_pivot — events pivoted to a wide per-day report: one row per
    * event date, one count column per event type plus the day's value
    * sum. Uses the relational pivot operator with an EXPLICIT value
    * list ([[EventTypes]]), so Spark skips the distinct-values job and
    * plans a single partial-agg groupBy (5 `count(CASE WHEN …)` columns
    * fused map-side — shuffle carries |days|·6 longs, not events).
    * DuckDB mirror states the same thing as conditional aggregation —
    * which is exactly the plan Spark generates for a listed pivot.
    */
  def pivotDaily(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, EventTypes)
      .join(
        Tables.events(s, d)
          .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
          .agg(TextSim.r4(TextSim.dsum(col("value"))).as("sum_value")),
        Seq("day"))
      .orderBy(col("day"))

  val pivotDailySql: String = {
    val cols = EventTypes.map(t =>
      s"       count(CASE WHEN event_type = '$t' THEN 1 END)::BIGINT AS \"$t\",").mkString("\n")
    s"""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       |$cols
       |       ${TextSim.r4Sql(TextSim.dsumSql("value"))} AS sum_value
       |FROM events
       |GROUP BY 1
       |ORDER BY day""".stripMargin
  }

  /** q_gapfill — time-grid densification (the missing-bucket problem of
    * every time-series rollup: an hour with no events vanishes from a
    * plain groupBy, so downstream charts/joins silently skip it). The
    * hour grid is GENERATED, not scanned: one 1-row min/max aggregate
    * → `sequence(...)` explode → cross join with the bounded key set —
    * grid size is |types|·|hours|, independent of event count — then
    * the per-(type, hour) partial agg left-joins onto it and gaps fill
    * with zero. At 100 TB the grid side stays tiny (it broadcasts);
    * the event side folds map-side before its one shuffle.
    */
  def gapfillHourly(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val span = ev.agg(
      date_trunc("hour", min(col("ts"))).as("lo"),
      date_trunc("hour", max(col("ts"))).as("hi"))
    val hours = span.select(
      explode(sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("h"))
    val grid = hours.crossJoin(
      ev.select(col("event_type")).distinct()) // ≤5 rows, broadcast
    val agg = ev
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        TextSim.r4(TextSim.dsum(col("value"))).as("sum_value"))
    grid.join(agg, Seq("h", "event_type"), "left")
      .select(
        date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"),
        col("n_events").isNull.cast("int").as("is_gap"))
      .orderBy(col("hour"), col("event_type"))
  }

  val gapfillHourlySql: String =
    s"""WITH span AS (
       |  SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
       |  FROM events
       |), grid AS (
       |  SELECT g.h, t.event_type
       |  FROM (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM span) g
       |  CROSS JOIN (SELECT DISTINCT event_type FROM events) t
       |), agg AS (
       |  SELECT date_trunc('hour', ts) AS h, event_type,
       |         count(*)::BIGINT AS n_events,
       |         ${TextSim.r4Sql(TextSim.dsumSql("value"))} AS sum_value
       |  FROM events GROUP BY 1, 2
       |)
       |SELECT strftime(grid.h, '%Y-%m-%d %H:%M:%S') AS hour,
       |       grid.event_type,
       |       coalesce(agg.n_events, 0)::BIGINT AS n_events,
       |       coalesce(agg.sum_value, 0.0) AS sum_value,
       |       (CASE WHEN agg.n_events IS NULL THEN 1 ELSE 0 END)::INT AS is_gap
       |FROM grid LEFT JOIN agg ON grid.h = agg.h AND grid.event_type = agg.event_type
       |ORDER BY hour, grid.event_type""".stripMargin

  /** q_trend_slope — per-type volume trend as an exact OLS fit over
    * the dense hour grid: is each event type's hourly count RISING or
    * FALLING across the window, and how fast — the trend line behind
    * `q_anomaly`'s point alarms (a level shift flags anomalies once; a
    * slope says the baseline itself is moving) and `q_trending`'s
    * decayed burst ranking (that weights recency; this fits direction).
    * The grid is DENSE (the q_gapfill lesson — missing hours are
    * y = 0 observations; skipping them biases the slope toward busy
    * periods).
    *
    * Determinism: with t = 0..H−1 hour indexes and integer counts,
    * every OLS moment (Σt, Σt², Σy, Σty) is an exact BIGINT, so
    * slope = (nΣty − ΣtΣy)/(nΣt² − (Σt)²) divides exactly-computed
    * integers ONCE in double (r6) — no libm anywhere, hash-verified.
    *
    * Scale shape: one corpus fold to (hour, type) counts, the grid is
    * generated (never scanned), and the regression folds the
    * |types|·H cell frame map-side to one moment row per type.
    */
  def trendSlope(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val span = ev.agg(
      date_trunc("hour", min(col("ts"))).as("lo"),
      date_trunc("hour", max(col("ts"))).as("hi"))
    val hours = span.select(
      explode(sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("h"),
      col("lo"))
      .withColumn("t", ((unix_micros(col("h")) - unix_micros(col("lo"))) /
        3600000000L).cast("long"))
    val grid = hours.crossJoin(ev.select(col("event_type")).distinct())
    val agg = ev
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("y"))
    grid.join(agg, Seq("h", "event_type"), "left")
      .withColumn("y", coalesce(col("y"), lit(0L)))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"),
        sum(col("t")).as("st"), sum(col("t") * col("t")).as("stt"),
        sum(col("y")).as("sy"), sum(col("t") * col("y")).as("sty"))
      .select(col("event_type"), col("n_hours"), col("sy").as("total"),
        TextSim.r6(
          (col("n_hours") * col("sty") - col("st") * col("sy")).cast("double") /
            (col("n_hours") * col("stt") - col("st") * col("st")).cast("double"))
          .as("slope_r6"))
      .orderBy(col("event_type"))
  }

  val trendSlopeSql: String =
    s"""WITH span AS (
       |  SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
       |  FROM events
       |), hours AS (
       |  SELECT g.h, ((epoch_us(g.h) - epoch_us(s.lo)) // 3600000000)::BIGINT AS t
       |  FROM (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM span) g
       |  CROSS JOIN span s
       |), grid AS (
       |  SELECT hours.h, hours.t, ty.event_type
       |  FROM hours CROSS JOIN (SELECT DISTINCT event_type FROM events) ty
       |), agg AS (
       |  SELECT date_trunc('hour', ts) AS h, event_type, count(*)::BIGINT AS y
       |  FROM events GROUP BY 1, 2
       |), cells AS (
       |  SELECT grid.event_type, grid.t, coalesce(agg.y, 0)::BIGINT AS y
       |  FROM grid LEFT JOIN agg ON grid.h = agg.h AND grid.event_type = agg.event_type
       |), mom AS (
       |  SELECT event_type, count(*)::BIGINT AS n_hours,
       |         sum(t)::BIGINT AS st, sum(t * t)::BIGINT AS stt,
       |         sum(y)::BIGINT AS sy, sum(t * y)::BIGINT AS sty
       |  FROM cells GROUP BY event_type
       |)
       |SELECT event_type, n_hours, sy AS total,
       |       ${TextSim.r6Sql("(n_hours * sty - st * sy)::DOUBLE / (n_hours * stt - st * st)::DOUBLE")} AS slope_r6
       |FROM mom
       |ORDER BY event_type""".stripMargin

  val EqDepthBuckets = 8

  /** q_equidepth — per-group equi-depth histogram (the optimizer
    * statistic for range-predicate selectivity: equal-mass buckets
    * put resolution where the data is, where `q_histogram`'s fixed
    * grid wastes buckets on empty ranges): per event type, 8 buckets
    * of n/8 ± 1 rows each with exact [lo, hi] value bounds. Bucket
    * membership is pure integer arithmetic on the rank —
    * ⌊(rn−1)·B/n⌋ — so boundaries are exact order statistics, engine-
    * identical (the `q_quantiles` discipline; interpolated histograms
    * never hash-match). Per-KEY window like q_quantiles — this is the
    * exact audit form; the rescan-free mergeable path at 100 TB is
    * the [[graft.operators.Kmv]] bottom-k sketch.
    */
  def equidepth(s: SparkSession, d: String): DataFrame = {
    val byType = Window.partitionBy(col("event_type"))
    val w = byType.orderBy(col("value"), col("event_id"))
    Tables.events(s, d)
      .select(col("event_type"), col("value"), col("event_id"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(byType))
      .withColumn("bucket",
        expr(s"CAST((rn - 1) * $EqDepthBuckets div n AS INT)"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        TextSim.r6(min(col("value"))).as("lo"),
        TextSim.r6(max(col("value"))).as("hi"))
      .orderBy(col("event_type"), col("bucket"))
  }

  val equidepthSql: String =
    s"""WITH ranked AS (
       |  SELECT event_type, value,
       |         row_number() OVER (PARTITION BY event_type
       |                            ORDER BY value, event_id) AS rn,
       |         count(*) OVER (PARTITION BY event_type) AS n
       |  FROM events
       |)
       |SELECT event_type,
       |       ((rn - 1) * $EqDepthBuckets // n)::INT AS bucket,
       |       count(*)::BIGINT AS n_rows,
       |       ${TextSim.r6Sql("min(value)")} AS lo,
       |       ${TextSim.r6Sql("max(value)")} AS hi
       |FROM ranked
       |GROUP BY event_type, bucket
       |ORDER BY event_type, bucket""".stripMargin
}
