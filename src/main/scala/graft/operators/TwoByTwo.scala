package graft.operators

import graft.Tables
import graft.functions.TextSim
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The epidemiologist's 2×2 table (cohort-study form; Wald CI per
  * Woolf 1955): exposure = "the user experienced an error event",
  * outcome = "the user purchased" — odds ratio, risk ratio, and risk
  * difference with the 95% CI on ln OR, answering the product
  * question "do errors depress conversion, and by how much" with the
  * effect-size vocabulary (`q_abtest` answers only whether a DESIGNED
  * split moved a mean; this reads an OBSERVED exposure, which is why
  * the three ratios and not a z ship — confounding is the reader's
  * problem and the label says so).
  *
  * Determinism: the table folds to four exact BIGINTs (a=exposed
  * converters, b=exposed non, c=unexposed converters, d=unexposed
  * non); OR/RR/risk-difference are exact micro ratios (one truncating
  * div each, cross-products on decimal/HUGEINT); ln OR decomposes
  * into micro-nat logs of the four counts (L(a)+L(d)−L(b)−L(c), the
  * [[MutualInfo]] one-libm-call rule), and the Wald se is the ONE
  * genuine double step — √(1/a+1/b+1/c+1/d), r6 — with the CI bounds
  * r6-rounded micro-nat arithmetic. Any zero cell → NULL ratios and
  * CI (the classic degenerate table; the +0.5 Haldane correction is
  * deliberately NOT applied silently — a zero cell should be SEEN).
  *
  * Scale: one per-user partial-agg fold (exposure and outcome flags
  * ride the same scan), one 4-cell fold, 1-row readout.
  */
object TwoByTwo {

  private def lnMicro(c: Column): Column =
    floor(log(c.cast("double")) * 1e6 + 0.5).cast("long")

  /** Exposure/outcome thresholds: every user sees every event type in
    * the fixture (existence flags give the all-ones degenerate
    * table), so both flags use the discriminating >= 14 count cut —
    * the q_abtest convention (per-user per-type counts center ~13).
    */
  def twoByTwo(s: SparkSession, d: String): DataFrame =
    twoByTwoOf(Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(
        (sum(when(col("event_type") === "error", 1L).otherwise(0L)) >= 14L)
          .cast("long").as("exposed"),
        (sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) >= 14L)
          .cast("long").as("outcome")))

  /** The 2×2 readout over any per-user (exposed, outcome) flag frame. */
  private[graft] def twoByTwoOf(users: DataFrame): DataFrame = {
    val t = users.agg(
      sum(when(col("exposed") === 1L && col("outcome") === 1L, 1L)
        .otherwise(0L)).cast("long").as("a"),
      sum(when(col("exposed") === 1L && col("outcome") === 0L, 1L)
        .otherwise(0L)).cast("long").as("b"),
      sum(when(col("exposed") === 0L && col("outcome") === 1L, 1L)
        .otherwise(0L)).cast("long").as("c"),
      sum(when(col("exposed") === 0L && col("outcome") === 0L, 1L)
        .otherwise(0L)).cast("long").as("d"))
    val ok = col("a") > 0L && col("b") > 0L && col("c") > 0L && col("d") > 0L
    t.select(col("a"), col("b"), col("c"), col("d"))
      .withColumn("or_micro", when(ok, expr(
        "cast((cast(a as decimal(38,0)) * d * 1000000) div (cast(b as decimal(38,0)) * c) as long)")))
      .withColumn("rr_micro", when(ok, expr(
        "cast((cast(a as decimal(38,0)) * (c + d) * 1000000) div (cast(c as decimal(38,0)) * (a + b)) as long)")))
      .withColumn("rd_micro", when(ok, expr(
        "(a * 1000000) div (a + b) - (c * 1000000) div (c + d)")))
      .withColumn("ln_or_micro", when(ok,
        lnMicro(col("a")) + lnMicro(col("d")) -
          lnMicro(col("b")) - lnMicro(col("c"))))
      .withColumn("se_micro", when(ok, floor(sqrt(
        lit(1.0) / col("a") + lit(1.0) / col("b") +
          lit(1.0) / col("c") + lit(1.0) / col("d")) * 1e6 + 0.5).cast("long")))
      .withColumn("ci_lo_micro", when(ok,
        col("ln_or_micro") - expr("(1959964 * se_micro) div 1000000")))
      .withColumn("ci_hi_micro", when(ok,
        col("ln_or_micro") + expr("(1959964 * se_micro) div 1000000")))
      .withColumn("significant_05", when(ok,
        (col("ci_lo_micro") > 0L || col("ci_hi_micro") < 0L).cast("int")))
  }

  val twoByTwoSql: String = {
    def ln(c: String) = s"floor(ln(($c)::DOUBLE) * 1e6 + 0.5)::BIGINT"
    s"""WITH users AS (
       |  SELECT user_id,
       |         (sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) >= 14)::BIGINT AS exposed,
       |         (sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14)::BIGINT AS outcome
       |  FROM events GROUP BY user_id
       |), t AS (
       |  SELECT sum(CASE WHEN exposed = 1 AND outcome = 1 THEN 1 ELSE 0 END)::BIGINT AS a,
       |         sum(CASE WHEN exposed = 1 AND outcome = 0 THEN 1 ELSE 0 END)::BIGINT AS b,
       |         sum(CASE WHEN exposed = 0 AND outcome = 1 THEN 1 ELSE 0 END)::BIGINT AS c,
       |         sum(CASE WHEN exposed = 0 AND outcome = 0 THEN 1 ELSE 0 END)::BIGINT AS d
       |  FROM users
       |), scored AS (
       |  SELECT a, b, c, d, (a > 0 AND b > 0 AND c > 0 AND d > 0) AS ok,
       |         CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0
       |              THEN ${ln("a")} + ${ln("d")} - ${ln("b")} - ${ln("c")}
       |              END AS lnor,
       |         CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0
       |              THEN floor(sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d) * 1e6 + 0.5)
       |              END::BIGINT AS se
       |  FROM t
       |)
       |SELECT a, b, c, d,
       |       CASE WHEN ok THEN (a::HUGEINT * d * 1000000) // (b::HUGEINT * c)
       |            END::BIGINT AS or_micro,
       |       CASE WHEN ok THEN (a::HUGEINT * (c + d) * 1000000) // (c::HUGEINT * (a + b))
       |            END::BIGINT AS rr_micro,
       |       CASE WHEN ok THEN (a * 1000000) // (a + b) - (c * 1000000) // (c + d)
       |            END::BIGINT AS rd_micro,
       |       CASE WHEN ok THEN lnor END::BIGINT AS ln_or_micro,
       |       CASE WHEN ok THEN se END::BIGINT AS se_micro,
       |       CASE WHEN ok THEN lnor - (1959964 * se) // 1000000 END::BIGINT AS ci_lo_micro,
       |       CASE WHEN ok THEN lnor + (1959964 * se) // 1000000 END::BIGINT AS ci_hi_micro,
       |       CASE WHEN ok THEN (lnor - (1959964 * se) // 1000000 > 0
       |                          OR lnor + (1959964 * se) // 1000000 < 0)::INT
       |            END AS significant_05
       |FROM scored""".stripMargin
  }
}
