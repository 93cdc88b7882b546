package graft.operators

import graft.Tables
import graft.functions.TextSim
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-sample Kolmogorov–Smirnov drift test over a NUMERIC column —
  * the continuous-distribution complement of the engine's categorical
  * drift tests: `q_drift`/`q_embed_drift` compare histogram SHAPES by
  * JSD (bucketed — a within-bucket shift is invisible), `q_chi2`
  * tests association between two categoricals, and `q_abtest`
  * compares one proportion; none answers "did this metric's whole
  * DISTRIBUTION move between last week and this week". KS does, with
  * no binning choice to tune: D = sup |F₁(x) − F₂(x)| over the
  * pooled empirical CDFs, rejected at α = 0.05 when
  * D > 1.358·√((n₁+n₂)/(n₁n₂)) (the large-sample Smirnov critical
  * value).
  *
  * Determinism: D's numerator is kept EXACT — over per-value counts,
  * max |C₁(x)·n₂ − C₂(x)·n₁| is a BIGINT fold (no double CDFs to
  * accumulate in partition order); D and the critical value each
  * divide/sqrt ONCE in double (IEEE sqrt, the house rule) and the
  * verdict compares the ROUNDED pair. A type with an empty arm
  * reports NULL d/verdict (the degenerate guard), never 0/0.
  *
  * Scale shape: one events fold to per-(type, value, arm) counts
  * (partial agg collapses repeats map-side); the running-sum window
  * partitions by event_type over its DISTINCT values — per-type
  * sorted state, the `q_quantiles` exact-audit shape (the rescan-free
  * 100 TB path is KS over [[Kmv]] bottom-k quantile sketches, at
  * ±ε CDF resolution); arm totals are a ≤|types| broadcast. The
  * split point is the exact integer midpoint of the observed
  * time span — slice membership is a per-row flag, not a join.
  */
object Ks {

  /** Smirnov α = 0.05 coefficient. */
  val CritCoef = 1.358

  /** Per-type two-sample KS between the first and second half of the
    * time window, over any `(event_type, ts, value)` frame:
    * `(event_type, n_early, n_late, d, crit, drifted)`.
    */
  def ksDrift(ev: DataFrame): DataFrame = {
    val span = ev.agg(
      min(unix_micros(col("ts"))).as("mn"),
      max(unix_micros(col("ts"))).as("mx"))
      .select(expr("(mn + mx) div 2").as("mid"))
    val flagged = ev.filter(col("value").isNotNull)
      .crossJoin(broadcast(span))
      .select(col("event_type"), col("value"),
        (unix_micros(col("ts")) < col("mid")).cast("long").as("early"))
    fromCells(cellsOf(flagged))
  }

  /** Per-(type, value) arm counts from a flagged `(event_type, value,
    * early)` frame — the MERGEABLE state of the test: counts add, so
    * per-batch cells merge with [[mergeCells]] and the nightly drift
    * check never rescans old events (the `bm25Stats` incremental
    * contract applied to a distribution test; merge ≡ one-shot
    * asserted in KsSpec).
    */
  def cellsOf(flagged: DataFrame): DataFrame =
    flagged
      .groupBy(col("event_type"), col("value"))
      .agg(sum(col("early")).as("c1"), sum(lit(1L) - col("early")).as("c2"))

  /** Add cell tables from disjoint event batches. */
  def mergeCells(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("event_type"), col("value"))
      .agg(sum(col("c1")).as("c1"), sum(col("c2")).as("c2"))

  /** The KS statistic from a (possibly merged) cell table. */
  def fromCells(counts: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val run = counts
      .withColumn("r1", sum(col("c1")).over(w))
      .withColumn("r2", sum(col("c2")).over(w))
    val tot = counts.groupBy(col("event_type"))
      .agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    val dbl = (c: org.apache.spark.sql.Column) => c.cast("double")
    run.join(broadcast(tot), "event_type")
      .groupBy(col("event_type"))
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        max(abs(col("r1") * col("n2") - col("r2") * col("n1"))).as("dnum"))
      .select(col("event_type"),
        col("n1").as("n_early"), col("n2").as("n_late"),
        when(col("n1") > 0 && col("n2") > 0,
          TextSim.r6(dbl(col("dnum")) / (dbl(col("n1")) * dbl(col("n2")))))
          .as("d"),
        when(col("n1") > 0 && col("n2") > 0,
          TextSim.r6(lit(CritCoef) *
            sqrt((dbl(col("n1")) + dbl(col("n2"))) /
              (dbl(col("n1")) * dbl(col("n2")))))).as("crit"),
        when(col("n1") > 0 && col("n2") > 0,
          (TextSim.r6(dbl(col("dnum")) / (dbl(col("n1")) * dbl(col("n2")))) >
            TextSim.r6(lit(CritCoef) *
              sqrt((dbl(col("n1")) + dbl(col("n2"))) /
                (dbl(col("n1")) * dbl(col("n2")))))).cast("int"))
          .as("drifted"))
  }

  /** q_ks_test — [[ksDrift]] of the event `value` metric between the
    * two halves of the observed window.
    */
  def ksQuery(s: SparkSession, d: String): DataFrame =
    ksDrift(Tables.events(s, d)).orderBy(col("event_type"))

  val ksSql: String =
    s"""WITH span AS (
       |  SELECT ((min(epoch_us(ts)) + max(epoch_us(ts))) // 2)::BIGINT AS mid
       |  FROM events
       |), flagged AS (
       |  SELECT event_type, value,
       |         (CASE WHEN epoch_us(ts) < span.mid THEN 1 ELSE 0 END)::BIGINT AS early
       |  FROM events CROSS JOIN span
       |  WHERE value IS NOT NULL
       |), counts AS (
       |  SELECT event_type, value,
       |         sum(early)::BIGINT AS c1, sum(1 - early)::BIGINT AS c2
       |  FROM flagged GROUP BY event_type, value
       |), run AS (
       |  SELECT event_type, c1, c2,
       |         sum(c1) OVER (PARTITION BY event_type ORDER BY value
       |                       ROWS UNBOUNDED PRECEDING)::BIGINT AS r1,
       |         sum(c2) OVER (PARTITION BY event_type ORDER BY value
       |                       ROWS UNBOUNDED PRECEDING)::BIGINT AS r2
       |  FROM counts
       |), tot AS (
       |  SELECT event_type, sum(c1)::BIGINT AS n1, sum(c2)::BIGINT AS n2
       |  FROM counts GROUP BY event_type
       |), agg AS (
       |  SELECT run.event_type, max(tot.n1)::BIGINT AS n1, max(tot.n2)::BIGINT AS n2,
       |         max(abs(run.r1 * tot.n2 - run.r2 * tot.n1))::BIGINT AS dnum
       |  FROM run JOIN tot ON tot.event_type = run.event_type
       |  GROUP BY run.event_type
       |)
       |SELECT event_type, n1 AS n_early, n2 AS n_late,
       |       CASE WHEN n1 > 0 AND n2 > 0 THEN
       |         ${TextSim.r6Sql("dnum::DOUBLE / (n1::DOUBLE * n2::DOUBLE)")}
       |       END AS d,
       |       CASE WHEN n1 > 0 AND n2 > 0 THEN
       |         ${TextSim.r6Sql(
      s"$CritCoef * sqrt((n1::DOUBLE + n2::DOUBLE) / (n1::DOUBLE * n2::DOUBLE))")}
       |       END AS crit,
       |       CASE WHEN n1 > 0 AND n2 > 0 THEN
       |         (CASE WHEN ${TextSim.r6Sql("dnum::DOUBLE / (n1::DOUBLE * n2::DOUBLE)")} >
       |                    ${TextSim.r6Sql(
      s"$CritCoef * sqrt((n1::DOUBLE + n2::DOUBLE) / (n1::DOUBLE * n2::DOUBLE))")}
       |               THEN 1 ELSE 0 END)::INT
       |       END AS drifted
       |FROM agg
       |ORDER BY event_type""".stripMargin

  /** ln(2/0.05) micro-rounded ONCE and interpolated into both engines
    * (the irrational-constant rule — zero runtime libm): the DKW
    * inequality gives sup|F̂ − F| ≤ √(ln(2/δ)/2k) w.p. 1−δ per
    * sketch, so the served D̂ carries a certified ±(ε₁+ε₂) band.
    */
  val Ln40Micro = 3.688879

  /** q_ks_kmv — the promised rescan-free KS twin (the q_winsorize_kmv
    * discipline applied to the distribution test): per-arm [[Kmv]]
    * bottom-k samples (one sketch pass keyed `type|arm`), D̂ read off
    * the two ≤k-row samples with the SAME exact-integer rank fold as
    * the full test (max |r₁·m₂ − r₂·m₁| over the union of sample
    * values — no double CDF accumulation), true arm counts n₁/n₂
    * from one cheap partial-agg fold. The verdict is the CONSERVATIVE
    * serving rule a sketch-backed monitor must use: declare drift
    * only when D̂ − (ε₁+ε₂) still clears the Smirnov critical value
    * at the TRUE sample sizes (DKW at δ = 0.05 per arm) — a certain
    * detection, never a sketch artifact. KsServedSpec cross-validates
    * |D̂ − D_exact| ≤ ε₁+ε₂ per type and that `drift_certain` never
    * fires where the exact test holds.
    *
    * In production the sketch and the count cells are both maintained
    * incrementally ([[Kmv.merge]] / [[mergeCells]]); the query builds
    * them in-line so the oracle mirrors the full lineage.
    */
  def ksServed(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val span = ev.agg(
      min(unix_micros(col("ts"))).as("mn"),
      max(unix_micros(col("ts"))).as("mx"))
      .select(expr("(mn + mx) div 2").as("mid"))
    val flagged = ev.filter(col("value").isNotNull)
      .crossJoin(broadcast(span))
      .select(col("event_type"), col("event_id"), col("value"),
        (unix_micros(col("ts")) < col("mid")).cast("long").as("early"))
    val sk = Kmv.sketch(
      flagged.withColumn("skey",
        concat_ws("|", col("event_type"), col("early"))),
      "skey", "event_id", "value")
      .select(expr("substring_index(key, '|', 1)").as("event_type"),
        expr("substring_index(key, '|', -1)").cast("long").as("early"),
        col("v"))
    // per-(type, value) sample counts per arm, then the exact rank fold
    val counts = sk.groupBy(col("event_type"), col("v").as("value"))
      .agg(sum(col("early")).as("c1"), sum(lit(1L) - col("early")).as("c2"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val run = counts
      .withColumn("r1", sum(col("c1")).over(w))
      .withColumn("r2", sum(col("c2")).over(w))
    val mtot = counts.groupBy(col("event_type"))
      .agg(sum(col("c1")).as("m1"), sum(col("c2")).as("m2"))
    val ntot = flagged.groupBy(col("event_type"))
      .agg(sum(col("early")).as("n1"), sum(lit(1L) - col("early")).as("n2"))
    val dbl = (c: org.apache.spark.sql.Column) => c.cast("double")
    run.join(broadcast(mtot), "event_type")
      .groupBy(col("event_type"))
      .agg(max(col("m1")).as("m1"), max(col("m2")).as("m2"),
        max(abs(col("r1") * col("m2") - col("r2") * col("m1"))).as("dnum"))
      .join(broadcast(ntot), "event_type")
      .select(col("event_type"),
        col("n1").as("n_early"), col("n2").as("n_late"),
        col("m1").as("m_early"), col("m2").as("m_late"),
        when(col("m1") > 0 && col("m2") > 0,
          TextSim.r6(dbl(col("dnum")) / (dbl(col("m1")) * dbl(col("m2")))))
          .as("d_est"),
        when(col("m1") > 0 && col("m2") > 0,
          TextSim.r6(sqrt(lit(Ln40Micro) / (dbl(col("m1")) * 2.0)) +
            sqrt(lit(Ln40Micro) / (dbl(col("m2")) * 2.0)))).as("eps"),
        when(col("n1") > 0 && col("n2") > 0,
          TextSim.r6(lit(CritCoef) *
            sqrt((dbl(col("n1")) + dbl(col("n2"))) /
              (dbl(col("n1")) * dbl(col("n2")))))).as("crit"))
      .withColumn("drift_certain",
        when(col("d_est").isNotNull && col("crit").isNotNull,
          (col("d_est") - col("eps") > col("crit")).cast("int")))
      .orderBy(col("event_type"))
  }

  val ksServedSql: String =
    s"""WITH span AS (
       |  SELECT ((min(epoch_us(ts)) + max(epoch_us(ts))) // 2)::BIGINT AS mid
       |  FROM events
       |), flagged AS (
       |  SELECT event_type, event_id, value,
       |         (CASE WHEN epoch_us(ts) < span.mid THEN 1 ELSE 0 END)::BIGINT AS early
       |  FROM events CROSS JOIN span
       |  WHERE value IS NOT NULL
       |), hashed AS (
       |  SELECT event_type, early, value AS v,
       |         md5((event_type || '|' || early) || '|' || event_id::VARCHAR) AS h
       |  FROM flagged
       |), rankedh AS (
       |  SELECT *, row_number() OVER (PARTITION BY event_type, early
       |                               ORDER BY h) AS rh
       |  FROM hashed
       |), kept AS (
       |  SELECT event_type, early, v FROM rankedh WHERE rh <= ${Kmv.K}
       |), counts AS (
       |  SELECT event_type, v AS value,
       |         sum(early)::BIGINT AS c1, sum(1 - early)::BIGINT AS c2
       |  FROM kept GROUP BY event_type, v
       |), run AS (
       |  SELECT event_type, c1, c2,
       |         sum(c1) OVER (PARTITION BY event_type ORDER BY value
       |                       ROWS UNBOUNDED PRECEDING)::BIGINT AS r1,
       |         sum(c2) OVER (PARTITION BY event_type ORDER BY value
       |                       ROWS UNBOUNDED PRECEDING)::BIGINT AS r2
       |  FROM counts
       |), mtot AS (
       |  SELECT event_type, sum(c1)::BIGINT AS m1, sum(c2)::BIGINT AS m2
       |  FROM counts GROUP BY event_type
       |), ntot AS (
       |  SELECT event_type, sum(early)::BIGINT AS n1,
       |         sum(1 - early)::BIGINT AS n2
       |  FROM flagged GROUP BY event_type
       |), agg AS (
       |  SELECT run.event_type, max(mtot.m1)::BIGINT AS m1,
       |         max(mtot.m2)::BIGINT AS m2,
       |         max(abs(run.r1 * mtot.m2 - run.r2 * mtot.m1))::BIGINT AS dnum
       |  FROM run JOIN mtot ON mtot.event_type = run.event_type
       |  GROUP BY run.event_type
       |), fin AS (
       |  SELECT a.event_type, n.n1, n.n2, a.m1, a.m2,
       |    CASE WHEN a.m1 > 0 AND a.m2 > 0 THEN
       |      ${TextSim.r6Sql("a.dnum::DOUBLE / (a.m1::DOUBLE * a.m2::DOUBLE)")}
       |    END AS d_est,
       |    CASE WHEN a.m1 > 0 AND a.m2 > 0 THEN
       |      ${TextSim.r6Sql(
      s"sqrt($Ln40Micro / (a.m1::DOUBLE * 2.0)) + sqrt($Ln40Micro / (a.m2::DOUBLE * 2.0))")}
       |    END AS eps,
       |    CASE WHEN n.n1 > 0 AND n.n2 > 0 THEN
       |      ${TextSim.r6Sql(
      s"$CritCoef * sqrt((n.n1::DOUBLE + n.n2::DOUBLE) / (n.n1::DOUBLE * n.n2::DOUBLE))")}
       |    END AS crit
       |  FROM agg a JOIN ntot n ON n.event_type = a.event_type
       |)
       |SELECT event_type, n1 AS n_early, n2 AS n_late,
       |       m1 AS m_early, m2 AS m_late, d_est, eps, crit,
       |       CASE WHEN d_est IS NOT NULL AND crit IS NOT NULL THEN
       |         (CASE WHEN d_est - eps > crit THEN 1 ELSE 0 END)::INT
       |       END AS drift_certain
       |FROM fin
       |ORDER BY event_type""".stripMargin
}
