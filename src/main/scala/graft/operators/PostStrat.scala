package graft.operators

import graft.Tables
import graft.functions.TextSim
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Post-stratified treatment-effect estimate — the third leg of the
  * experimentation variance stool ([[Events.abtest]] raw z,
  * [[Events.cuped]] covariate adjustment, this: STRATIFICATION,
  * Miratrix–Sekhon–Yu 2013): partition users by a pre-treatment
  * stratum (here the static cohort user_id % 4 — region/platform in
  * a real system), estimate the arm difference WITHIN each stratum,
  * recombine weighted by stratum size:
  *
  *   τ̂ = Σ_g w_g (ȳ_gA − ȳ_gB),   w_g = n_g/n
  *   Var(τ̂) = Σ_g w_g² (s²_gA/n_gA + s²_gB/n_gB)
  *
  * Between-stratum variance drops out of the estimator — the budget
  * CUPED spends on a covariate, spent on a partition instead; when
  * strata explain nothing the estimate reduces to the raw difference
  * (the spec asserts both directions).
  *
  * Determinism: the r6 rule says FIX TO THE INTEGER LATTICE BEFORE
  * ANY CROSS-ROW SUM — a 4-value double Σ still folds in partition
  * order. Per stratum, the arm-mean difference is micro-fixed
  * ((Σy·1e6) div n, exact BIGINT) and the variance term pico-fixed
  * via exact (n·Σy² − (Σy)²) numerators on DECIMAL/HUGEINT, so the
  * stratum fold is exact integer arithmetic; the 1-row readout then
  * runs in double with mirrored shapes, r6. Lattice bias
  * < #strata·1e-6 — documented, identical both engines. Degenerate
  * cells (any stratum-arm n ≤ 1) NULL the stratified columns; a
  * degenerate arm NULLs all inference.
  *
  * Scale: one per-user partial-agg fold (bucket by user →
  * exchange-free at 100 TB) → ≤2·Strata cell rows → 1-row readout.
  */
object PostStrat {

  /** Number of static user strata. */
  val Strata = 4L

  def stratified(s: SparkSession, d: String): DataFrame = {
    val users = Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).cast("long").as("y"))
      .withColumn("variant",
        when(conv(substring(md5(concat(lit("arm:"),
          col("user_id").cast("string"))), 1, 7), 16, 10)
          .cast("long") % 2 === 0, "A").otherwise("B"))
      .withColumn("g", col("user_id") % Strata)
    fromUsers(users)
  }

  /** The readout over any (g, variant, y) per-user frame. */
  def fromUsers(users: DataFrame): DataFrame = {
    val cells = users.groupBy(col("g"), col("variant"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("y")).cast("long").as("sy"),
        sum(col("y") * col("y")).cast("long").as("syy"))
    def armAgg(a: String, f: String) =
      sum(when(col("variant") === a, col(f))).cast("long")
    val strata = cells.groupBy(col("g"))
      .agg(armAgg("A", "n").as("na"), armAgg("A", "sy").as("sya"),
        armAgg("A", "syy").as("syya"),
        armAgg("B", "n").as("nb"), armAgg("B", "sy").as("syb"),
        armAgg("B", "syy").as("syyb"))
      .select(
        coalesce(col("na"), lit(0L)).as("na"),
        coalesce(col("sya"), lit(0L)).as("sya"),
        coalesce(col("syya"), lit(0L)).as("syya"),
        coalesce(col("nb"), lit(0L)).as("nb"),
        coalesce(col("syb"), lit(0L)).as("syb"),
        coalesce(col("syyb"), lit(0L)).as("syyb"))
    // exact per-stratum lattice values: mean-diff in micro, variance
    // term in pico off DECIMAL numerators (n·Σy² − (Σy)² can reach
    // ~1e26 scaled — past BIGINT, the HUGEINT/decimal recipe)
    val gOk = col("na") > 1L && col("nb") > 1L
    val dec = (c: Column) => c.cast("decimal(38,0)")
    // `div` (IntegralDivide) on DECIMAL operands truncates toward zero
    // exactly like DuckDB's `//` on HUGEINT — a decimal `/` + cast
    // would ROUND and diverge on .9999995-type quotients
    def vterm(n: String, sy: String, syy: String) =
      s"(CAST(1000000000000 AS DECIMAL(38,0)) * (CAST($n AS DECIMAL(38,0)) * $syy - CAST($sy AS DECIMAL(38,0)) * $sy)) div (CAST($n AS DECIMAL(38,0)) * $n * ($n - 1))"
    val contrib = strata.select(
      (col("na") + col("nb")).as("ng"),
      col("na"), col("sya"), col("syya"),
      col("nb"), col("syb"), col("syyb"),
      when(gOk, expr("(sya * 1000000) div na - (syb * 1000000) div nb"))
        .as("dgm"),
      when(gOk, expr(vterm("na", "sya", "syya")) +
        expr(vterm("nb", "syb", "syyb"))).as("vgp"))
    val out = contrib.agg(
      sum(col("ng")).cast("long").as("n"),
      min(when(col("dgm").isNull, 0L).otherwise(1L)).as("all_ok"),
      sum(col("ng") * col("dgm")).cast("long").as("wtau"),
      sum(dec(col("ng")) * dec(col("ng")) * dec(col("vgp")))
        .cast("decimal(38,0)").as("wvar"),
      sum(col("na")).cast("long").as("tna"),
      sum(col("sya")).cast("long").as("tsya"),
      sum(col("syya")).cast("long").as("tsyya"),
      sum(col("nb")).cast("long").as("tnb"),
      sum(col("syb")).cast("long").as("tsyb"),
      sum(col("syyb")).cast("long").as("tsyyb"))
    val dbl = (c: Column) => c.cast("double")
    def sv(sy: Column, syy: Column, n: Column) =
      (dbl(syy) - dbl(sy) * dbl(sy) / dbl(n)) / (dbl(n) - 1.0)
    val rawOk = col("tna") > 1L && col("tnb") > 1L
    val tauRaw = dbl(col("tsya")) / dbl(col("tna")) -
      dbl(col("tsyb")) / dbl(col("tnb"))
    val varRaw = sv(col("tsya"), col("tsyya"), col("tna")) / dbl(col("tna")) +
      sv(col("tsyb"), col("tsyyb"), col("tnb")) / dbl(col("tnb"))
    val varStrat = dbl(col("wvar")) / dbl(col("n")) / dbl(col("n")) / 1e12
    val ok = rawOk && col("all_ok") === 1L
    out.select(col("n").as("n_users"),
      when(rawOk, TextSim.r6(tauRaw)).as("tau_raw"),
      when(rawOk, TextSim.r6(sqrt(varRaw))).as("se_raw"),
      when(ok, TextSim.r6(dbl(col("wtau")) / dbl(col("n")) / 1e6))
        .as("tau_strat"),
      when(ok, TextSim.r6(sqrt(varStrat))).as("se_strat"),
      when(ok, TextSim.r6(lit(1.0) - varStrat / varRaw)).as("var_reduction"))
  }

  val stratifiedSql: String = {
    def sv(sy: String, syy: String, n: String) =
      s"(($syy)::DOUBLE - ($sy)::DOUBLE * ($sy)::DOUBLE / ($n)::DOUBLE) / (($n)::DOUBLE - 1.0)"
    def vterm(n: String, sy: String, syy: String) =
      s"(1000000000000::HUGEINT * (($n)::HUGEINT * ($syy)::HUGEINT - ($sy)::HUGEINT * ($sy)::HUGEINT)) // (($n)::HUGEINT * ($n)::HUGEINT * (($n) - 1)::HUGEINT)"
    val tauRaw = "tsya::DOUBLE / tna::DOUBLE - tsyb::DOUBLE / tnb::DOUBLE"
    val varRaw = s"${sv("tsya", "tsyya", "tna")} / tna::DOUBLE + ${sv("tsyb", "tsyyb", "tnb")} / tnb::DOUBLE"
    val varStrat = "wvar::DOUBLE / n::DOUBLE / n::DOUBLE / 1e12"
    s"""WITH users AS (
       |  SELECT user_id, count(*)::BIGINT AS y,
       |         CASE WHEN ('0x' || substr(md5('arm:' || user_id), 1, 7))::BIGINT % 2 = 0
       |              THEN 'A' ELSE 'B' END AS variant,
       |         user_id % $Strata AS g
       |  FROM events GROUP BY user_id
       |), cells AS (
       |  SELECT g, variant, count(*)::BIGINT AS n, sum(y)::BIGINT AS sy,
       |         sum(y * y)::BIGINT AS syy
       |  FROM users GROUP BY g, variant
       |), strata AS (
       |  SELECT g,
       |    coalesce(sum(CASE WHEN variant = 'A' THEN n END), 0)::BIGINT AS na,
       |    coalesce(sum(CASE WHEN variant = 'A' THEN sy END), 0)::BIGINT AS sya,
       |    coalesce(sum(CASE WHEN variant = 'A' THEN syy END), 0)::BIGINT AS syya,
       |    coalesce(sum(CASE WHEN variant = 'B' THEN n END), 0)::BIGINT AS nb,
       |    coalesce(sum(CASE WHEN variant = 'B' THEN sy END), 0)::BIGINT AS syb,
       |    coalesce(sum(CASE WHEN variant = 'B' THEN syy END), 0)::BIGINT AS syyb
       |  FROM cells GROUP BY g
       |), contrib AS (
       |  SELECT (na + nb) AS ng, na, sya, syya, nb, syb, syyb,
       |    CASE WHEN na > 1 AND nb > 1
       |         THEN (sya * 1000000) // na - (syb * 1000000) // nb
       |         END AS dgm,
       |    CASE WHEN na > 1 AND nb > 1
       |         THEN (${vterm("na", "sya", "syya")})::BIGINT
       |            + (${vterm("nb", "syb", "syyb")})::BIGINT
       |         END AS vgp
       |  FROM strata
       |), agg AS (
       |  SELECT sum(ng)::BIGINT AS n,
       |         min(CASE WHEN dgm IS NULL THEN 0 ELSE 1 END) AS all_ok,
       |         sum(ng * dgm)::BIGINT AS wtau,
       |         sum(ng::HUGEINT * ng::HUGEINT * vgp::HUGEINT) AS wvar,
       |         sum(na)::BIGINT AS tna, sum(sya)::BIGINT AS tsya,
       |         sum(syya)::BIGINT AS tsyya,
       |         sum(nb)::BIGINT AS tnb, sum(syb)::BIGINT AS tsyb,
       |         sum(syyb)::BIGINT AS tsyyb
       |  FROM contrib
       |)
       |SELECT n AS n_users,
       |       CASE WHEN tna > 1 AND tnb > 1
       |            THEN ${TextSim.r6Sql(tauRaw)} END AS tau_raw,
       |       CASE WHEN tna > 1 AND tnb > 1
       |            THEN ${TextSim.r6Sql(s"sqrt($varRaw)")} END AS se_raw,
       |       CASE WHEN tna > 1 AND tnb > 1 AND all_ok = 1
       |            THEN ${TextSim.r6Sql("wtau::DOUBLE / n::DOUBLE / 1e6")}
       |            END AS tau_strat,
       |       CASE WHEN tna > 1 AND tnb > 1 AND all_ok = 1
       |            THEN ${TextSim.r6Sql(s"sqrt($varStrat)")} END AS se_strat,
       |       CASE WHEN tna > 1 AND tnb > 1 AND all_ok = 1
       |            THEN ${TextSim.r6Sql(s"1.0 - ($varStrat) / ($varRaw)")}
       |            END AS var_reduction
       |FROM agg""".stripMargin
  }
}
