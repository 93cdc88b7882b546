package graft.operators

import graft.Tables
import graft.functions.TextSim
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-ordered joins the built-in equi-join can't express directly:
  * per-key AS-OF (latest right row at or before each left row) and
  * point-in-interval range joins. Both are implemented as single-
  * shuffle equi-join/window plans — never an inequality join, which
  * Spark executes as BroadcastNestedLoop/cartesian and which dies at
  * corpus scale.
  *
  * Reference behavior: the ETL's incremental scheduling compares each
  * page's `last_edited_time` against the latest prior snapshot row
  * (`Notion_openai_vector_etl.py:383-401` keeps per-page freshest
  * state) — an as-of lookup; the windows here generalize it to any
  * keyed event timeline.
  */
object TimeJoin {

  /** AS-OF join: for every left row, attach the LATEST right row with
    * `right.ts <= left.ts` in the same `key` group (null columns when
    * no prior right row exists — left rows are never dropped).
    *
    * Plan shape: tag the sides, union, one window over
    * `(key; ts, side)` with a `last(ignoreNulls)` carry, filter back
    * to left rows. ONE shuffle on `key`, an in-partition sort, zero
    * inequality joins — at 10⁹ rows/key-partition this is the same
    * cost as sessionization, while the naive
    * `l JOIN r ON l.k = r.k AND r.ts <= l.ts` + max-window plan
    * explodes to |l|·|r| pairs per key first. Right rows sort before
    * left rows at equal `ts` (side 0 < 1), so an exactly-simultaneous
    * right row IS matched — the `>=` convention of SQL ASOF JOIN.
    *
    * Right's carried columns ride in ONE struct so `last(ignoreNulls)`
    * skips only missing-side rows, never a legitimately-null field
    * inside a matched row (per-column carries would resurrect older
    * values for null fields).
    *
    * Determinism requires `right` unique on `(key, ts)` — dedup first
    * (the query below keeps `max(event_id)` per instant); ties between
    * distinct right rows at one instant have no defined winner in any
    * engine. Skewed keys inherit the usual window caveat: a single
    * key's timeline must fit one partition's sort — salt upstream if a
    * key exceeds that.
    */
  def asOfPrior(left: DataFrame, right: DataFrame, key: String, ts: String,
                prefix: String = "asof_"): DataFrame = {
    val lOther = left.columns.toSeq.filterNot(c => c == key || c == ts)
    val rCarry = right.columns.toSeq.filterNot(c => c == key || c == ts)
    val packed = struct((col(ts).as("_rts") +: rCarry.map(col)): _*)
    val rPart = right
      .select((Seq(col(key), col(ts), lit(0).as("_side"), packed.as("_rpack")) ++
        lOther.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val packType = rPart.schema("_rpack").dataType
    val lPart = left
      .select((Seq(col(key), col(ts), lit(1).as("_side"),
        lit(null).cast(packType).as("_rpack")) ++ lOther.map(col)): _*)
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lPart.unionByName(rPart)
      .withColumn("_m", last(col("_rpack"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    matched.select((Seq(col(key), col(ts)) ++ lOther.map(col) ++
      (col("_m._rts").as(s"$prefix$ts") +:
        rCarry.map(c => col(s"_m.$c").as(s"$prefix$c")))): _*)
  }

  /** Point-in-interval join: pairs of (point, interval) with
    * `lo <= pt < hi`, keyless. Implemented as a bucketed EQUI-join:
    * grid time into `bucketWidth` cells, explode each interval onto
    * the (at most ⌈len/width⌉+1) cells it overlaps, equi-join on the
    * cell, keep the exact residual predicate. Spark would otherwise
    * plan a keyless inequality join as BroadcastNestedLoop — a
    * |points|·|intervals| scan. Here shuffle volume is
    * |points| + |intervals|·cells, and cells stays O(1) when
    * `bucketWidth` ≈ interval length. Time-uniform cells make the join
    * skew-free; a pair lands exactly once (a point has one cell, an
    * interval holds each cell at most once).
    */
  def pointsInIntervals(points: DataFrame, intervals: DataFrame,
                        pt: String, lo: String, hi: String,
                        bucketWidth: Long): DataFrame = {
    val iv = intervals.withColumn("_b",
      explode(sequence(col(lo).divide(bucketWidth).cast("long"),
        (col(hi) - 1).divide(bucketWidth).cast("long"))))
    val p = points.withColumn("_b", col(pt).divide(bucketWidth).cast("long"))
    p.join(iv, p("_b") === iv("_b") && p(pt) >= iv(lo) && p(pt) < iv(hi))
      .drop("_b")
  }

  /** Interval-overlap join: pairs of (a, b) intervals with
    * `a.lo < b.hi AND b.lo < a.hi` (half-open overlap), keyless. Same
    * bucketed-equi-join idea as [[pointsInIntervals]], but both sides
    * span multiple cells, so a naive cell join would emit a pair once
    * per SHARED cell — deduped here with zero extra shuffle by the
    * canonical-cell rule: a pair is kept only in the cell containing
    * its overlap START, `max(a.lo, b.lo)`. That instant lies inside
    * both intervals (it is < min(a.hi, b.hi) whenever they overlap),
    * so its cell is on both explode lists — each pair survives in
    * EXACTLY one joined row, no `distinct` pass over the pair set.
    * Caller aliases columns apart; both frames' columns pass through.
    */
  def intervalsOverlap(a: DataFrame, b: DataFrame,
                       aLo: String, aHi: String, bLo: String, bHi: String,
                       bucketWidth: Long): DataFrame = {
    val ae = a.withColumn("_ca",
      explode(sequence(col(aLo).divide(bucketWidth).cast("long"),
        (col(aHi) - 1).divide(bucketWidth).cast("long"))))
    val be = b.withColumn("_cb",
      explode(sequence(col(bLo).divide(bucketWidth).cast("long"),
        (col(bHi) - 1).divide(bucketWidth).cast("long"))))
    ae.join(be, ae("_ca") === be("_cb") &&
        ae(aLo) < be(bHi) && be(bLo) < ae(aHi) &&
        greatest(ae(aLo), be(bLo)).divide(bucketWidth).cast("long") === ae("_ca"))
      .drop("_ca", "_cb")
  }

  /** NEAREST as-of join within a tolerance — the pandas
    * `merge_asof(direction="nearest")` semantics: each left row takes
    * the right row minimizing |gap| among those within `tolUs`, ties
    * to the PRIOR side (a sensor reading attributed to the closest
    * calibration sweep; an event to the closest snapshot — backward
    * [[asOfPrior]] is wrong by up to the whole revisit interval when
    * the next observation is closer). `ts` must be an epoch-µs LONG
    * column on both frames.
    *
    * Plan shape: the forward pass REUSES the tag-union-window kernel
    * on NEGATED time — latest(≤ −t) ≡ earliest(≥ t), with the
    * equal-instant convention preserved — so nearest is exactly two
    * [[asOfPrior]] passes (two key-shuffles of the same frames; at
    * scale both land on the same bucketing) and a per-row pick,
    * never an inequality join.
    */
  def asOfNearest(left: DataFrame, right: DataFrame, key: String, ts: String,
                  tolUs: Long, prefix: String = "near_"): DataFrame = {
    val rCarry = right.columns.toSeq.filterNot(c => c == key || c == ts)
    val p = asOfPrior(left, right, key, ts, "_p_")
    val n = asOfPrior(p.withColumn(ts, -col(ts)),
      right.withColumn(ts, -col(ts)), key, ts, "_n_")
      .withColumn(ts, -col(ts))
      .withColumn(s"_n_$ts", -col(s"_n_$ts"))
    val gp = col(ts) - col(s"_p_$ts")
    val gn = col(s"_n_$ts") - col(ts)
    val pOk = col(s"_p_$ts").isNotNull && gp <= tolUs
    val nOk = col(s"_n_$ts").isNotNull && gn <= tolUs
    val usePrior = pOk && (!nOk || gp <= gn)
    val useNext = nOk && (!pOk || gn < gp)
    val picked = n
      .withColumn(s"${prefix}dir",
        when(usePrior, "prior").when(useNext, "next").otherwise(lit(null)))
      .withColumn(s"${prefix}gap_us",
        when(usePrior, gp).when(useNext, gn).otherwise(lit(null)))
      .withColumn(s"$prefix$ts",
        when(usePrior, col(s"_p_$ts")).when(useNext, col(s"_n_$ts"))
          .otherwise(lit(null)))
    val carried = rCarry.map(c =>
      when(usePrior, col(s"_p_$c")).when(useNext, col(s"_n_$c"))
        .otherwise(lit(null)).as(s"$prefix$c"))
    val keep = left.columns.toSeq.map(col) ++
      Seq(col(s"$prefix$ts"), col(s"${prefix}gap_us"), col(s"${prefix}dir")) ++
      carried
    picked.select(keep: _*)
  }

  private val WinUs = 600000000L // 10-minute incident window, in µs

  /** q_asof_join — each purchase event annotated with the user's
    * latest click at-or-before it (ASOF semantics): click id, its
    * instant, and the gap. Clicks are pre-deduped to one row per
    * (user, instant) so the match is well-defined. Timestamps are
    * emitted as epoch-µs BIGINTs — exact, no format-parity risk.
    */
  def asOfJoinQuery(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("click_id"))
    asOfPrior(purchases, clicks, "user_id", "ts", prefix = "click_")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        TextSim.r4(col("value")).as("value"),
        col("click_click_id").as("click_id"),
        unix_micros(col("click_ts")).as("click_ts_us"),
        (unix_micros(col("ts")) - unix_micros(col("click_ts"))).as("gap_us"))
      .orderBy(col("event_id"))
  }

  val asOfJoinSql: String =
    s"""WITH l AS (
       |  SELECT event_id, user_id, ts, value FROM events
       |  WHERE event_type = 'purchase'
       |), r AS (
       |  SELECT user_id, ts, max(event_id) AS click_id FROM events
       |  WHERE event_type = 'click' GROUP BY user_id, ts
       |)
       |SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us,
       |       ${TextSim.r4Sql("l.value")} AS value,
       |       r.click_id, epoch_us(r.ts) AS click_ts_us,
       |       epoch_us(l.ts) - epoch_us(r.ts) AS gap_us
       |FROM l ASOF LEFT JOIN r
       |  ON l.user_id = r.user_id AND l.ts >= r.ts
       |ORDER BY event_id""".stripMargin

  /** q_asof_nearest — each purchase annotated with the user's CLOSEST
    * click within 10 minutes, either direction, ties backward
    * ([[asOfNearest]]): the attribution convention when "the click
    * that caused this" may have been logged just after the purchase
    * row (clock skew, late batching). Unmatched purchases keep null
    * annotations. Oracle: one backward + one forward DuckDB ASOF
    * LEFT JOIN with the same pick rule.
    */
  /** Nearest tolerance: 24 h — matches ~57% of fixture purchases with
    * both directions well represented (60 prior / 55 next at
    * sf0.001), so the pick rule, the tolerance cut, AND the unmatched
    * path all carry weight in the hash.
    */
  val NearTolUs = 86400000000L

  def asOfNearestQuery(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .agg(max(col("event_id")).as("click_id"))
    asOfNearest(purchases, clicks, "user_id", "ts_us", NearTolUs, "click_")
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("click_click_id").as("click_id"),
        col("click_ts_us").as("click_ts_us"),
        col("click_gap_us").as("gap_us"),
        col("click_dir").as("dir"))
      .orderBy(col("event_id"))
  }

  val asOfNearestSql: String =
    s"""WITH l AS (
       |  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
       |  WHERE event_type = 'purchase'
       |), r AS (
       |  SELECT user_id, epoch_us(ts) AS ts_us, max(event_id) AS click_id
       |  FROM events WHERE event_type = 'click' GROUP BY user_id, epoch_us(ts)
       |), p AS (
       |  SELECT l.event_id, r.click_id AS p_id, r.ts_us AS p_ts
       |  FROM l ASOF LEFT JOIN r
       |    ON l.user_id = r.user_id AND l.ts_us >= r.ts_us
       |), n AS (
       |  SELECT l.event_id, r.click_id AS n_id, r.ts_us AS n_ts
       |  FROM l ASOF LEFT JOIN r
       |    ON l.user_id = r.user_id AND l.ts_us <= r.ts_us
       |), j AS (
       |  SELECT l.event_id, l.user_id, l.ts_us, p.p_id, p.p_ts, n.n_id, n.n_ts,
       |         (p.p_ts IS NOT NULL AND l.ts_us - p.p_ts <= $NearTolUs) AS p_ok,
       |         (n.n_ts IS NOT NULL AND n.n_ts - l.ts_us <= $NearTolUs) AS n_ok
       |  FROM l JOIN p USING (event_id) JOIN n USING (event_id)
       |)
       |SELECT event_id, user_id, ts_us,
       |       CASE WHEN p_ok AND (NOT n_ok OR ts_us - p_ts <= n_ts - ts_us)
       |              THEN p_id
       |            WHEN n_ok THEN n_id END AS click_id,
       |       CASE WHEN p_ok AND (NOT n_ok OR ts_us - p_ts <= n_ts - ts_us)
       |              THEN p_ts
       |            WHEN n_ok THEN n_ts END AS click_ts_us,
       |       CASE WHEN p_ok AND (NOT n_ok OR ts_us - p_ts <= n_ts - ts_us)
       |              THEN ts_us - p_ts
       |            WHEN n_ok THEN n_ts - ts_us END AS gap_us,
       |       CASE WHEN p_ok AND (NOT n_ok OR ts_us - p_ts <= n_ts - ts_us)
       |              THEN 'prior'
       |            WHEN n_ok THEN 'next' END AS dir
       |FROM j
       |ORDER BY event_id""".stripMargin

  /** q_range_join — keyless interval aggregation: purchases falling in
    * the 10 minutes after each error event (count + summed value),
    * zero-match errors kept at 0. The DuckDB oracle states it as the
    * declarative inequality join; the Spark side runs the bucketed
    * equi-join above — same answer, scale-safe plan.
    */
  def rangeJoinQuery(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val errs = ev.filter(col("event_type") === "error")
      .select(col("event_id"), unix_micros(col("ts")).as("lo"))
      .withColumn("hi", col("lo") + WinUs)
    val purch = ev.filter(col("event_type") === "purchase")
      .select(unix_micros(col("ts")).as("t"), col("value"))
    val hits = pointsInIntervals(purch, errs, "t", "lo", "hi", WinUs)
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n"), TextSim.dsum(col("value")).as("sv"))
    errs.join(hits, Seq("event_id"), "left")
      .select(col("event_id"), col("lo").as("win_start_us"),
        coalesce(col("n"), lit(0L)).as("n_purchases"),
        TextSim.r4(coalesce(col("sv"), lit(0.0))).as("sum_value"))
      .orderBy(col("event_id"))
  }

  /** q_overlap_join — which incident windows collide: the 10-minute
    * windows after each error event, self-joined on overlap (pairs
    * once, `a < b` by event id), with the overlap length. The oracle
    * states the declarative inequality self-join; the Spark side runs
    * the canonical-cell bucketed join — same pairs, linear shuffle.
    */
  def overlapJoinQuery(s: SparkSession, d: String): DataFrame = {
    val errs = Tables.events(s, d).filter(col("event_type") === "error")
      .select(col("event_id"), unix_micros(col("ts")).as("lo"))
      .withColumn("hi", col("lo") + WinUs)
    val a = errs.select(col("event_id").as("a_id"), col("lo").as("a_lo"), col("hi").as("a_hi"))
    val b = errs.select(col("event_id").as("b_id"), col("lo").as("b_lo"), col("hi").as("b_hi"))
    intervalsOverlap(a, b, "a_lo", "a_hi", "b_lo", "b_hi", WinUs)
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (least(col("a_hi"), col("b_hi")) - greatest(col("a_lo"), col("b_lo"))).as("overlap_us"))
      .orderBy(col("a_id"), col("b_id"))
  }

  val overlapJoinSql: String =
    s"""WITH e AS (
       |  SELECT event_id, epoch_us(ts) AS lo, epoch_us(ts) + $WinUs AS hi
       |  FROM events WHERE event_type = 'error'
       |)
       |SELECT a.event_id AS a_id, b.event_id AS b_id,
       |       least(a.hi, b.hi) - greatest(a.lo, b.lo) AS overlap_us
       |FROM e a JOIN e b
       |  ON a.event_id < b.event_id AND a.lo < b.hi AND b.lo < a.hi
       |ORDER BY a_id, b_id""".stripMargin

  val rangeJoinSql: String =
    s"""WITH e AS (
       |  SELECT event_id, epoch_us(ts) AS lo FROM events
       |  WHERE event_type = 'error'
       |), p AS (
       |  SELECT epoch_us(ts) AS t, value FROM events
       |  WHERE event_type = 'purchase'
       |)
       |SELECT e.event_id, e.lo AS win_start_us,
       |       count(p.t) AS n_purchases,
       |       ${TextSim.r4Sql(s"coalesce(${TextSim.dsumSql("p.value")}, 0)")} AS sum_value
       |FROM e LEFT JOIN p
       |  ON p.t >= e.lo AND p.t < e.lo + $WinUs
       |GROUP BY e.event_id, e.lo
       |ORDER BY event_id""".stripMargin
}
