package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Difference-in-differences readout — the quasi-experimental
  * estimator for launches WITHOUT a randomized holdout (Card &
  * Krueger 1994 canon): compare the treated group's before/after
  * change against the control group's, so any shared time trend
  * (seasonality, marketing, the thing that poisons a naive
  * before/after) subtracts out. Completes the causal family:
  * [[Events.abtest]] needs randomization, [[Events.cuped]] needs a
  * pre-period covariate, DiD needs only the parallel-trends reading.
  *
  * Determinism: treatment is the md5 user split (the house
  * discipline), the period boundary is the exact integer span
  * midpoint ((mn + mx) div 2 — the r9 Ks/Psi idiom), the per-cell
  * metric is events per user on the micro lattice ((Σy·1e6) div n),
  * and the DiD estimate is pure integer subtraction of the four cell
  * means. One corpus fold keyed (user, period); the 4-cell lattice
  * does the rest.
  *
  * Output: one row — per-cell user counts and mean_micro, the two
  * deltas, did_micro.
  */
object Did {

  def did(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val span = ev.agg(
      min(unix_micros(col("ts"))).as("mn"),
      max(unix_micros(col("ts"))).as("mx"))
      .select(expr("(mn + mx) div 2").as("mid"))
    val cells = ev.crossJoin(broadcast(span))
      .select(col("user_id"),
        when(conv(substring(md5(concat(lit("arm:"),
          col("user_id").cast("string"))), 1, 7), 16, 10)
          .cast("long") % 2 === 0, 1L).otherwise(0L).as("treated"),
        (unix_micros(col("ts")) >= col("mid")).cast("long").as("post"))
      .groupBy(col("user_id"), col("treated"), col("post"))
      .agg(count(lit(1)).cast("long").as("y"))
      .groupBy(col("treated"), col("post"))
      .agg(count(lit(1)).cast("long").as("n_users"),
        sum(col("y")).cast("long").as("sum_y"))
      .withColumn("mean_micro", expr("(sum_y * 1000000) div n_users"))
    val wide = cells.groupBy(lit(1).as("g"))
      .pivot(concat(col("treated"), lit("_"), col("post")),
        Seq("1_1", "1_0", "0_1", "0_0"))
      .agg(first(col("mean_micro")))
      .withColumnRenamed("1_1", "t_post").withColumnRenamed("1_0", "t_pre")
      .withColumnRenamed("0_1", "c_post").withColumnRenamed("0_0", "c_pre")
    val counts = cells.agg(
      sum(when(col("treated") === 1, col("n_users"))).cast("long")
        .as("n_treated_cells"),
      sum(when(col("treated") === 0, col("n_users"))).cast("long")
        .as("n_control_cells"))
    wide.crossJoin(broadcast(counts))
      .select(col("n_treated_cells"), col("n_control_cells"),
        col("t_pre"), col("t_post"), col("c_pre"), col("c_post"),
        (col("t_post") - col("t_pre")).as("treated_delta_micro"),
        (col("c_post") - col("c_pre")).as("control_delta_micro"),
        ((col("t_post") - col("t_pre")) - (col("c_post") - col("c_pre")))
          .as("did_micro"))
  }

  val didSql: String = {
    def arm = "CASE WHEN ('0x' || substr(md5('arm:' || user_id), 1, 7))::BIGINT % 2 = 0 THEN 1 ELSE 0 END"
    s"""WITH mid AS (
       |  SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid FROM events
       |), users AS (
       |  SELECT user_id, $arm AS treated,
       |         CASE WHEN epoch_us(ts) >= m.mid THEN 1 ELSE 0 END AS post,
       |         count(*)::BIGINT AS y
       |  FROM events CROSS JOIN mid m
       |  GROUP BY 1, 2, 3
       |), cells AS MATERIALIZED (
       |  SELECT treated, post, count(*)::BIGINT AS n_users,
       |         (sum(y)::BIGINT * 1000000) // count(*) AS mean_micro
       |  FROM users GROUP BY 1, 2
       |)
       |SELECT
       |  (SELECT sum(n_users) FROM cells WHERE treated = 1)::BIGINT
       |    AS n_treated_cells,
       |  (SELECT sum(n_users) FROM cells WHERE treated = 0)::BIGINT
       |    AS n_control_cells,
       |  (SELECT mean_micro FROM cells WHERE treated = 1 AND post = 0) AS t_pre,
       |  (SELECT mean_micro FROM cells WHERE treated = 1 AND post = 1) AS t_post,
       |  (SELECT mean_micro FROM cells WHERE treated = 0 AND post = 0) AS c_pre,
       |  (SELECT mean_micro FROM cells WHERE treated = 0 AND post = 1) AS c_post,
       |  (SELECT mean_micro FROM cells WHERE treated = 1 AND post = 1)
       |    - (SELECT mean_micro FROM cells WHERE treated = 1 AND post = 0)
       |    AS treated_delta_micro,
       |  (SELECT mean_micro FROM cells WHERE treated = 0 AND post = 1)
       |    - (SELECT mean_micro FROM cells WHERE treated = 0 AND post = 0)
       |    AS control_delta_micro,
       |  ((SELECT mean_micro FROM cells WHERE treated = 1 AND post = 1)
       |    - (SELECT mean_micro FROM cells WHERE treated = 1 AND post = 0))
       |  - ((SELECT mean_micro FROM cells WHERE treated = 0 AND post = 1)
       |    - (SELECT mean_micro FROM cells WHERE treated = 0 AND post = 0))
       |    AS did_micro""".stripMargin
  }
}
