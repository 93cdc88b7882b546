package graft.operators

import graft.Tables
import graft.functions.TextSim
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Association rules over session baskets (Agrawal & Srikant
  * VLDB'94, the Apriori statistics at itemset size 2) — the
  * market-basket family the engine lacked: `q_session_paths` mines
  * ORDERED adjacent transitions; this mines UNORDERED co-presence —
  * "sessions that search also purchase" regardless of order or
  * adjacency, with the three standard strengths: support (how often
  * the pair occurs), confidence (P(b|a), directional), and lift
  * (dependence vs independence — the one that can't be gamed by
  * popularity; lift ≈ 1 means the pair co-occurs exactly as often as
  * chance).
  *
  * Determinism: all counts are exact BIGINTs over DISTINCT per-session
  * item sets (a session saying "click" nine times is one basket
  * membership — the standard basket semantics); support/confidence/
  * lift divide once each (r6). Rules are emitted in both directions;
  * pair enumeration is a within-session self-join on the basket
  * frame, bounded by |item vocabulary| per session (≤|event types|),
  * never events².
  *
  * Scale shape: sessions come from the q_sessionize gap rule (per-user
  * window, user-bounded state); baskets are one distinct fold keyed
  * (user, session, type); the pair join keys on the session id —
  * co-partitioned with the basket fold, and at 100 TB both sides
  * bucket by session. Item and pair counts fold map-side to
  * ≤|types|² rows; the n-sessions total is a 1-row broadcast.
  */
object Assoc {

  /** Minimum pair support count for an emitted rule. */
  val MinSupport = 5L

  def assocQuery(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    // barrier: n_sessions, item counts and BOTH pair-join sides read
    // the basket frame — unpersisted, each reference re-runs the
    // corpus-wide sessionize window. The gap is Paths.GapUs, the ONE
    // house constant, so q_assoc can never silently sessionize
    // differently from q_session_paths/q_markov.
    val baskets = Tables.events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > Paths.GapUs, 1)
          .otherwise(0))
      .withColumn("session_seq",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("user_id"), col("session_seq"), col("event_type"))
      .distinct()
      .persist()
    val nSessions = baskets.select(col("user_id"), col("session_seq")).distinct()
      .agg(count(lit(1)).cast("long").as("n_sessions"))
    val items = baskets.groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("c"))
    val pairs = baskets.as("x")
      .join(baskets.as("y"), Seq("user_id", "session_seq"))
      .filter(col("x.event_type") =!= col("y.event_type"))
      .groupBy(col("x.event_type").as("a"), col("y.event_type").as("b"))
      .agg(count(lit(1)).cast("long").as("c_ab"))
      .filter(col("c_ab") >= MinSupport)
    pairs
      .join(broadcast(items.select(col("event_type").as("a"), col("c").as("c_a"))), "a")
      .join(broadcast(items.select(col("event_type").as("b"), col("c").as("c_b"))), "b")
      .crossJoin(broadcast(nSessions))
      .select(col("a"), col("b"), col("c_ab"), col("c_a"), col("c_b"),
        TextSim.r6(col("c_ab").cast("double") / col("n_sessions").cast("double"))
          .as("support"),
        TextSim.r6(col("c_ab").cast("double") / col("c_a").cast("double"))
          .as("confidence"),
        TextSim.r6(col("c_ab").cast("double") * col("n_sessions").cast("double") /
          (col("c_a").cast("double") * col("c_b").cast("double"))).as("lift"))
      .orderBy(col("a"), col("b"))
  }

  val assocSql: String =
    s"""WITH marked AS (
       |  SELECT user_id, event_id, event_type, ts,
       |         CASE WHEN lag(ts) OVER w IS NULL
       |                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > ${Paths.GapUs}
       |              THEN 1 ELSE 0 END AS new_session
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |), sessions AS (
       |  SELECT user_id, event_type,
       |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                                ROWS UNBOUNDED PRECEDING) AS session_seq
       |  FROM marked
       |), baskets AS (
       |  SELECT DISTINCT user_id, session_seq, event_type FROM sessions
       |), n_sessions AS (
       |  SELECT count(*)::BIGINT AS n_sessions
       |  FROM (SELECT DISTINCT user_id, session_seq FROM baskets)
       |), items AS (
       |  SELECT event_type, count(*)::BIGINT AS c FROM baskets GROUP BY event_type
       |), pairs AS (
       |  SELECT x.event_type AS a, y.event_type AS b, count(*)::BIGINT AS c_ab
       |  FROM baskets x
       |  JOIN baskets y ON y.user_id = x.user_id AND y.session_seq = x.session_seq
       |  WHERE x.event_type <> y.event_type
       |  GROUP BY x.event_type, y.event_type
       |  HAVING count(*) >= $MinSupport
       |)
       |SELECT a, b, c_ab, ia.c AS c_a, ib.c AS c_b,
       |       ${TextSim.r6Sql("c_ab::DOUBLE / n_sessions::DOUBLE")} AS support,
       |       ${TextSim.r6Sql("c_ab::DOUBLE / ia.c::DOUBLE")} AS confidence,
       |       ${TextSim.r6Sql(
      "c_ab::DOUBLE * n_sessions::DOUBLE / (ia.c::DOUBLE * ib.c::DOUBLE)")} AS lift
       |FROM pairs
       |JOIN items ia ON ia.event_type = a
       |JOIN items ib ON ib.event_type = b
       |CROSS JOIN n_sessions
       |ORDER BY a, b""".stripMargin
}
