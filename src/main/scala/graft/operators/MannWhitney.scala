package graft.operators

import graft.Tables
import graft.functions.TextSim
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mann–Whitney U rank-sum test (Mann & Whitney 1947, Wilcoxon 1945)
  * — the DISTRIBUTION-FREE two-sample location test, completing the
  * experiment-readout ladder next to [[Events.abtest]] (normal z on
  * means), [[PermTest]] (exact randomization), and `q_ks_test`
  * (whole-CDF distance): U asks only "does one arm stochastically
  * dominate the other", is invariant to any monotone transform of the
  * metric, and is the standard readout when per-user metrics are
  * heavy-tailed enough that the mean test's variance estimate is
  * untrustworthy but a full permutation pass is too blunt.
  *
  * Determinism — the whole statistic lives on the integer lattice via
  * the DOUBLE-RANK trick: with c(v) copies of value v and cumBelow(v)
  * values strictly smaller, every copy's mid-rank is
  * cumBelow + (c+1)/2, so TWICE the rank, r2(v) = 2·cumBelow + c + 1,
  * is an exact integer even under ties. 2·R_a = Σ c_a(v)·r2(v) and
  * 2·U_a = 2·R_a − n_a(n_a+1) are exact BIGINTs; the tie term
  * T = Σ (c³−c) and the variance numerator
  * n_a·n_b·((n+1)·n·(n−1) − T) fold on decimal(38,0)/HUGEINT (the
  * [[Autocorr]] rule — n³ wraps int64 far below 100 TB user counts).
  * Exactly ONE double step ships: z = (2U − n_a·n_b) / (2·√Var),
  * r6-rounded, with Var = varnum / (12·n·(n−1)); an all-tied corpus
  * has varnum = 0 and z is NULL (guarded identically in both engines).
  *
  * Scale: one corpus fold to per-user counts (user-bucketed at
  * 100 TB), one fold to the DISTINCT-VALUE grid (bounded by the
  * metric's support, not the user count), one ordered cumulative over
  * that grid (single-partition window on a bounded frame — the
  * q_quantiles discipline), one 1-row readout. No corpus-sized
  * shuffle after the first fold.
  */
object MannWhitney {

  /** md5-parity arm split — the house assignment discipline
    * (identical string recipe to [[PermTest]]'s observed arm).
    */
  private def armOf(key: Column): Column =
    when(conv(substring(md5(key), 1, 7), 16, 10).cast("long") % 2 === 0, 1L)
      .otherwise(0L)

  def mannWhitney(s: SparkSession, d: String): DataFrame =
    mannWhitneyOfUsers(Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).cast("long").as("y")))

  /** The test over any per-user `(user_id, y)` frame. */
  def mannWhitneyOfUsers(users: DataFrame): DataFrame = {
    val withArm = users.withColumn("a",
      armOf(concat(lit("arm:"), col("user_id").cast("string"))))
    val grid = withArm.groupBy(col("y"))
      .agg(count(lit(1)).cast("long").as("c"),
        sum(when(col("a") === 1L, 1L).otherwise(0L)).cast("long").as("ca"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("y"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val ranked = grid
      .withColumn("below", coalesce(sum(col("c")).over(w), lit(0L)))
      .withColumn("r2", lit(2L) * col("below") + col("c") + 1L)
    ranked.agg(
      sum(col("c")).cast("long").as("n"),
      sum(col("ca")).cast("long").as("n_a"),
      // decimal(38,0) fold: r2a ~ 2n^2 — a raw BIGINT sum would wrap
      // silently in Spark past ~2e9 users while DuckDB's HUGEINT errs
      // loudly; fold exact on decimal (the varnum discipline), cast at
      // the readout where u_x2 ~ n^2/4 is the documented bound
      sum(col("ca").cast("decimal(38,0)") * col("r2")).as("r2a"),
      sum(col("c") * col("c") * col("c") - col("c")).cast("long").as("ties"))
      .select(
        col("n_a"),
        (col("n") - col("n_a")).as("n_b"),
        // n_a·(n_a+1) on decimal too: a BIGINT product wraps silently in
        // Spark past n_a ~ 3e9 while DuckDB's errs loudly (r10 ADVICE) —
        // the whole u_x2 expression folds exact, long only at the end
        (col("r2a") - col("n_a").cast("decimal(38,0)") * (col("n_a") + 1L))
          .cast("long").as("u_x2"),
        col("ties").as("tie_term"),
        col("n"))
      .withColumn("varnum",
        col("n_a").cast("decimal(38,0)") * col("n_b") *
          ((col("n") + 1L).cast("decimal(38,0)") * col("n") * (col("n") - 1L)
            - col("tie_term").cast("decimal(38,0)")))
      .withColumn("z",
        when(col("varnum") > 0L, TextSim.r6(
          (col("u_x2") - col("n_a") * col("n_b")).cast("double") /
            (lit(2.0) * sqrt(col("varnum").cast("double") /
              (lit(12.0) * col("n").cast("double") * (col("n") - 1L).cast("double")))))))
      .withColumn("significant_05",
        when(col("z").isNotNull, (abs(col("z")) > 1.959964).cast("int")))
      .select(col("n_a"), col("n_b"), col("u_x2"), col("tie_term"),
        col("z"), col("significant_05"))
  }

  val mannWhitneySql: String = {
    val arm = "CASE WHEN ('0x' || substr(md5('arm:' || user_id), 1, 7))::BIGINT % 2 = 0 THEN 1 ELSE 0 END"
    s"""WITH users AS (
       |  SELECT user_id, count(*)::BIGINT AS y FROM events GROUP BY user_id
       |), grid AS (
       |  SELECT y, count(*)::BIGINT AS c,
       |         sum($arm)::BIGINT AS ca
       |  FROM users GROUP BY y
       |), ranked AS (
       |  SELECT c, ca,
       |         coalesce(sum(c) OVER (ORDER BY y
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS below
       |  FROM grid
       |), folded AS (
       |  SELECT sum(c)::BIGINT AS n, sum(ca)::BIGINT AS n_a,
       |         sum(ca::HUGEINT * (2 * below + c + 1)) AS r2a,
       |         sum(c * c * c - c)::BIGINT AS ties
       |  FROM ranked
       |), stats AS (
       |  SELECT n_a, (n - n_a)::BIGINT AS n_b,
       |         (r2a - n_a::HUGEINT * (n_a + 1))::BIGINT AS u_x2,
       |         ties AS tie_term, n,
       |         n_a::HUGEINT * (n - n_a) *
       |           ((n + 1)::HUGEINT * n * (n - 1) - ties::HUGEINT) AS varnum
       |  FROM folded
       |), zc AS (
       |  SELECT n_a, n_b, u_x2, tie_term,
       |         CASE WHEN varnum > 0 THEN ${TextSim.r6Sql(
      "(u_x2 - n_a * n_b)::DOUBLE / (2.0 * sqrt(varnum::DOUBLE / (12.0 * n::DOUBLE * (n - 1)::DOUBLE)))")}
       |              END AS z
       |  FROM stats
       |)
       |SELECT n_a, n_b, u_x2, tie_term, z,
       |       CASE WHEN z IS NOT NULL THEN (abs(z) > 1.959964)::INT END
       |         AS significant_05
       |FROM zc""".stripMargin
  }
}
