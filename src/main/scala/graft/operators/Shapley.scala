package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shapley-value channel attribution — the PRINCIPLED multi-touch
  * rule next to [[q_attribution]]'s first/last/linear heuristics
  * (Shapley 1953; the "data-driven attribution" standard): each
  * marketing channel's credit is its average marginal contribution
  * over every ordering of the channel coalition. The heuristics
  * disagree with each other by construction; Shapley is the unique
  * rule satisfying efficiency + symmetry + dummy + additivity, which
  * is why readout reviews reach for it when the heuristics fight.
  *
  * Setup: a user's coalition is the SET of non-purchase channels they
  * touched (click/error/signup/view → a 4-bit mask); the value of a
  * coalition S is v(S) = number of CONVERTED users whose channel set
  * ⊆ S (conversions reachable with S). Users with an empty channel
  * set convert "direct" and sit in v(∅) — every marginal difference
  * subtracts them out.
  *
  * Exactness: the corpus folds ONCE to per-user (mask, converted) —
  * keyed by user, the only corpus-sized shuffle — then EVERYTHING
  * runs on the 16-row coalition lattice: v by a subset-sum join
  * ((m & S) = m), Shapley by the exact factorial weights. With k = 4
  * channels every weight has denominator 4! = 24, so φ·24 is an exact
  * integer (`phi24`) and efficiency Σφ = v(full) − v(∅) holds on the
  * lattice exactly (ShapleySpec asserts it). A 5th channel changes a
  * constant, not the shape.
  *
  * Output: `(channel, phi24, phi_micro, v_solo, v_full, conv_direct)`.
  */
object Shapley {

  /** Channel bit assignment — lexicographic, the house tie order. */
  val Channels: Seq[(String, Int)] =
    Seq("click" -> 1, "error" -> 2, "signup" -> 4, "view" -> 8)

  private val fact = Array(1L, 1L, 2L, 6L)

  def shapley(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
    val maskExpr = Channels.map { case (name, bit) =>
      max(when(col("event_type") === name, bit).otherwise(0))
    }.reduce(_ + _)
    val users = ev.groupBy(col("user_id"))
      .agg(maskExpr.cast("int").as("mask"),
        max(when(col("event_type") === "purchase", 1).otherwise(0))
          .as("converted"))
    val byMask = users.filter(col("converted") === 1)
      .groupBy(col("mask")).agg(count(lit(1)).cast("long").as("conv"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // the 16-coalition lattice on the driver (bounded by 2^k, never
    // the corpus): v(S) = Σ_{m ⊆ S} conv(m)
    val v = (0 until 16).map(sMask =>
      sMask -> (0 until 16).filter(m => (m & sMask) == m)
        .map(m => byMask.getOrElse(m, 0L)).sum).toMap
    val rows = Channels.map { case (name, bit) =>
      val others = (0 until 16).filter(sMask => (sMask & bit) == 0)
      val phi24 = others.map { sMask =>
        val k = Integer.bitCount(sMask)
        fact(k) * fact(3 - k) * (v(sMask | bit) - v(sMask))
      }.sum
      (name, phi24, phi24 * 1000000L / 24L, v(bit), v(15), v(0))
    }
    rows.toDF("channel", "phi24", "phi_micro", "v_solo", "v_full",
      "conv_direct").orderBy(col("channel"))
  }

  val shapleySql: String = {
    val maskSql = Channels.map { case (name, bit) =>
      s"max(CASE WHEN event_type = '$name' THEN $bit ELSE 0 END)"
    }.mkString(" + ")
    val chRows = Channels.map { case (n, b) => s"('$n', $b)" }.mkString(", ")
    s"""WITH users AS MATERIALIZED (
       |  SELECT user_id, ($maskSql)::INT AS mask,
       |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
       |  FROM events GROUP BY user_id
       |), by_mask AS (
       |  SELECT mask, count(*)::BIGINT AS conv
       |  FROM users WHERE conv = 1 GROUP BY mask
       |), lattice AS (SELECT unnest(range(0, 16))::INT AS s),
       |v AS MATERIALIZED (
       |  SELECT l.s, coalesce(sum(b.conv), 0)::BIGINT AS v
       |  FROM lattice l LEFT JOIN by_mask b ON (b.mask & l.s) = b.mask
       |  GROUP BY l.s
       |), ch(channel, bit) AS (VALUES $chRows),
       |fct(k, f) AS (VALUES (0, 1), (1, 1), (2, 2), (3, 6)),
       |phi AS (
       |  SELECT c.channel, c.bit,
       |         sum(fs.f * fo.f * (vw.v - vo.v))::BIGINT AS phi24
       |  FROM ch c
       |  JOIN lattice l ON (l.s & c.bit) = 0
       |  JOIN v vo ON vo.s = l.s
       |  JOIN v vw ON vw.s = (l.s | c.bit)
       |  JOIN fct fs ON fs.k = bit_count(l.s::BIGINT)
       |  JOIN fct fo ON fo.k = 3 - bit_count(l.s::BIGINT)
       |  GROUP BY c.channel, c.bit
       |)
       |SELECT p.channel, p.phi24,
       |       (p.phi24 * 1000000) // 24 AS phi_micro,
       |       vs.v AS v_solo, vf.v AS v_full, ve.v AS conv_direct
       |FROM phi p
       |JOIN v vs ON vs.s = p.bit
       |JOIN v vf ON vf.s = 15
       |JOIN v ve ON ve.s = 0
       |ORDER BY p.channel""".stripMargin
  }
}
