package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CART decision-stump split finder (Breiman–Friedman–Olshen–Stone
  * 1984): the best binary threshold on a numeric feature for a binary
  * target by Gini impurity decrease — the inner loop of every
  * tree/GBDT trainer, and the screening question "can n_chars alone
  * separate English from the rest, and where's the knee?". Run on
  * feature = n_chars, target = (lang = 'en').
  *
  * Determinism — the DECISION is all-integer: for a 2-class node,
  * n·Gini = (n² − c² − (n−c)²)/n, so each candidate threshold's
  * post-split cost folds as cost_micro = ((nL² − cL² − (nL−cL)²)·1e6)
  * div nL + (same for R) — exact cumulative counts over the sorted
  * DISTINCT-value grid (the q_quantiles discipline), one truncating
  * div per side, argmin by struct-min of (cost, threshold) so ties
  * break toward the smallest threshold. Gain = parent_micro − cost;
  * products on decimal(38,0)/HUGEINT (n² wraps int64 past ~3e9 rows).
  * A constant target gives every candidate cost 0 = parent (gain 0,
  * never negative-by-rounding: the parent uses the same div lattice).
  *
  * Scale: one corpus fold to the distinct-value grid (bounded by the
  * feature's support, not the row count); one ordered cumulative; the
  * argmin is a 1-row struct-min fold, never a global sort. The
  * histogram-approximate split of production GBDTs (bin to 256 bands)
  * drops in by pre-bucketing the same pipeline.
  */
object BestSplit {

  def bestSplit(s: SparkSession, d: String): DataFrame =
    bestSplitOf(Tables.documents(s, d)
      .select(col("n_chars").cast("long").as("x"),
        (col("lang") === "en").cast("long").as("y")))

  /** Best Gini split over any (x, y∈{0,1}) frame. */
  private[graft] def bestSplitOf(rows: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grid = rows.groupBy(col("x"))
      .agg(count(lit(1)).cast("long").as("cnt"),
        sum(col("y")).cast("long").as("pos"))
    val w = Window.orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    def nodeCost(n: String, c: String): String =
      s"""((cast($n as decimal(38,0)) * $n - cast($c as decimal(38,0)) * $c
         |  - cast($n - $c as decimal(38,0)) * ($n - $c)) * 1000000)
         |  div cast($n as decimal(38,0))""".stripMargin
    val cum = grid
      .withColumn("nl", sum(col("cnt")).over(w))
      .withColumn("cl", sum(col("pos")).over(w))
      .withColumn("n", sum(col("cnt")).over(all))
      .withColumn("c", sum(col("pos")).over(all))
      .filter(col("nl") < col("n")) // the last value splits nothing off
      .withColumn("nr", col("n") - col("nl"))
      .withColumn("cr", col("c") - col("cl"))
      .withColumn("cost_micro", expr(
        s"cast((${nodeCost("nl", "cl")}) + (${nodeCost("nr", "cr")}) as long)"))
    cum.agg(
      max(col("n")).as("n"),
      max(col("c")).as("n_pos"),
      min(struct(col("cost_micro"), col("x"), col("nl"), col("cl"),
        col("nr"), col("cr"))).as("b"))
      .select(col("n"), col("n_pos"),
        col("b.x").as("best_threshold"),
        col("b.cost_micro").as("cost_micro"),
        expr(s"cast(${nodeCost("n", "n_pos")} as long)").as("parent_micro"),
        col("b.nl").as("n_left"), col("b.cl").as("pos_left"),
        col("b.nr").as("n_right"), col("b.cr").as("pos_right"))
      .withColumn("gain_micro", col("parent_micro") - col("cost_micro"))
  }

  val bestSplitSql: String = {
    def nodeCost(n: String, c: String) =
      s"(($n::HUGEINT * $n - $c::HUGEINT * $c - ($n - $c)::HUGEINT * ($n - $c)) * 1000000) // $n::HUGEINT"
    s"""WITH grid AS (
       |  SELECT n_chars::BIGINT AS x, count(*)::BIGINT AS cnt,
       |         sum((lang = 'en')::BIGINT)::BIGINT AS pos
       |  FROM documents GROUP BY 1
       |), cum AS (
       |  SELECT x,
       |         sum(cnt) OVER (ORDER BY x)::BIGINT AS nl,
       |         sum(pos) OVER (ORDER BY x)::BIGINT AS cl,
       |         sum(cnt) OVER ()::BIGINT AS n,
       |         sum(pos) OVER ()::BIGINT AS c
       |  FROM grid
       |), cand AS (
       |  SELECT x, nl, cl, (n - nl)::BIGINT AS nr, (c - cl)::BIGINT AS cr,
       |         n, c,
       |         ((${nodeCost("nl", "cl")}) + (${nodeCost("(n - nl)", "(c - cl)")}))::BIGINT
       |           AS cost_micro
       |  FROM cum WHERE nl < n
       |), best AS (
       |  SELECT * FROM cand ORDER BY cost_micro, x LIMIT 1
       |)
       |SELECT n, c AS n_pos, x AS best_threshold, cost_micro,
       |       (${nodeCost("n", "c")})::BIGINT AS parent_micro,
       |       nl AS n_left, cl AS pos_left, nr AS n_right, cr AS pos_right,
       |       ((${nodeCost("n", "c")})::BIGINT - cost_micro)::BIGINT AS gain_micro
       |FROM best""".stripMargin
  }
}
