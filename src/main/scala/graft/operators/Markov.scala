package graft.operators

import graft.Tables
import graft.functions.TextSim
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stationary distribution of the session-transition Markov chain —
  * the steady-state face of `q_session_paths`: transitions say what
  * follows what; π says where user attention SETTLES if behavior
  * keeps its present dynamics (the input to "which surface gets the
  * capacity/latency budget"). PageRank's fixed-point discipline
  * ([[Crawl.pageRank]]) applied to the behavioral chain instead of
  * the link graph, without damping — the chain's own structure is
  * the object of study.
  *
  * Determinism: mass lives in [[Crawl.PrScale]] 1e-12 units as
  * BIGINTs; each round folds π'(j) = Σᵢ (π(i)·n_ij) div tᵢ in exact
  * integer arithmetic — engine-identical on any partitioning.
  * Flooring leaks ≤|S|² units/round (the documented pageRank
  * trade); a state with no outgoing transitions keeps its mass
  * (self-loop semantics — the chain stays substochastic-safe). The
  * reported share divides once (r6).
  *
  * Scale note: the transition matrix is |types|² — an audit-bounded
  * statistic; the 20 rounds run EXECUTOR-SIDE over exact longs as a
  * single `flatMapGroups` group (the chain couples all states, so
  * unlike [[Ewma]]'s per-type split the iteration is one group — but
  * the driver now holds nothing that grows with the type enum); a
  * state space that grows with the data (per-page chains) runs the
  * same update through the [[Crawl.pageRank]] distributed join
  * driver instead.
  */
object Markov {

  val Iters = 20

  /** Exact driver-side power iteration over `(from, to, n, t)` rows. */
  private[graft] def stationary(cells: Seq[(String, String, Long, Long)],
    states: Seq[String], iters: Int = Iters): Map[String, Long] = {
    val scale = Crawl.PrScale
    var pi: Map[String, Long] = states.map(s => s -> scale / states.length).toMap
    for (_ <- 1 to iters) {
      val out = cells.groupBy(_._1).keySet
      val moved = cells.groupBy(_._2).view.mapValues(_.map { case (f, _, n, t) =>
        // π(f)·n div t — BigInt product (π ≤ 1e12, n ≤ corpus)
        (BigInt(pi(f)) * n / t).toLong
      }.sum).toMap
      val kept = states.filterNot(out.contains).map(s => s -> pi(s)).toMap
      pi = states.map(s =>
        s -> (moved.getOrElse(s, 0L) + kept.getOrElse(s, 0L))).toMap
    }
    pi
  }

  def markovQuery(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val trans = Paths.sessionPaths(s, d)
      .select(col("from_type"), col("to_type"), col("n"))
    val tot = trans.groupBy(col("from_type"))
      .agg(sum(col("n")).cast("long").as("t"))
    trans.join(tot, "from_type")
      .select(col("from_type"), col("to_type"), col("n").cast("long"), col("t"))
      .as[(String, String, Long, Long)]
      .groupByKey(_ => 0)
      .flatMapGroups { (_, it) =>
        val cells = it.toSeq
        val states = (cells.map(_._1) ++ cells.map(_._2)).distinct.sorted
        val pi = stationary(cells, states)
        states.iterator.map(st => (st, pi(st)))
      }
      .toDF("state", "pi_units")
      .select(col("state"), col("pi_units"),
        TextSim.r6(col("pi_units").cast("double") / Crawl.PrScale.toDouble)
          .as("share"))
      .orderBy(col("state"))
  }

  val markovSql: String = {
    val base =
      s"""marked AS (
         |  SELECT event_type, lag(event_type) OVER w AS prev_type,
         |         lag(ts) OVER w AS prev_ts, ts
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         |), counts AS (
         |  SELECT prev_type AS f, event_type AS tt, count(*)::BIGINT AS n
         |  FROM marked
         |  WHERE prev_ts IS NOT NULL AND epoch_us(ts) - epoch_us(prev_ts) <= ${Paths.GapUs}
         |  GROUP BY 1, 2
         |), tot AS (
         |  SELECT f, sum(n)::BIGINT AS t FROM counts GROUP BY f
         |), cells AS MATERIALIZED (
         |  SELECT c.f, c.tt, c.n, tot.t FROM counts c JOIN tot USING (f)
         |), states AS MATERIALIZED (
         |  SELECT DISTINCT f AS s FROM cells UNION SELECT DISTINCT tt FROM cells
         |), pi0 AS MATERIALIZED (
         |  SELECT s, (${Crawl.PrScale} // (SELECT count(*) FROM states))::BIGINT AS m
         |  FROM states
         |)""".stripMargin
    val steps = (1 to Iters).map { i =>
      val p = s"pi${i - 1}"
      s"""pi$i AS MATERIALIZED (
         |  SELECT s, (
         |    coalesce((SELECT sum((p.m::HUGEINT * c.n) // c.t)
         |              FROM cells c JOIN $p p ON p.s = c.f
         |              WHERE c.tt = states.s), 0)
         |    + CASE WHEN states.s NOT IN (SELECT f FROM cells)
         |           THEN (SELECT m FROM $p WHERE $p.s = states.s) ELSE 0 END
         |  )::BIGINT AS m
         |  FROM states
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH $base,
       |$steps
       |SELECT s AS state, m AS pi_units,
       |       ${TextSim.r6Sql(s"m::DOUBLE / ${Crawl.PrScale}.0")} AS share
       |FROM pi$Iters
       |ORDER BY state""".stripMargin
  }
}
