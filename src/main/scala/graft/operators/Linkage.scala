package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Probabilistic record linkage (Fellegi–Sunter 1969) — entity
  * resolution over STRUCTURED records, the registry-side counterpart of
  * the text dedup family: two feeds describing the same real-world
  * entities under different keys (a re-crawled workspace after an id
  * migration, a vendor dump against the house registry — the reference
  * pipeline's manifest matches files by id; linkage is what replaces it
  * when ids DON'T carry over). Each candidate pair is scored by the sum
  * of per-field log-likelihood ratios: agreement on field f adds
  * ln(m_f/u_f), disagreement adds ln((1−m_f)/(1−u_f)), where m = P(agree
  * | match) and u = P(agree | non-match); thresholds split the score
  * into match / possible (clerical review) / non-match.
  *
  * Determinism: the weights are fixed to integer MICRO-NATS driver-side
  * (the [[NaiveBayes]] discipline), so a pair's score is exact long
  * arithmetic — order-independent, hash-oracle-verified; the verdict
  * thresholds compare integers.
  *
  * Scale shape: candidate generation is MULTI-PASS blocking (the
  * standard F-S design) with the candidate count bounded PER RECORD,
  * not per block value — a fixed-cardinality block key alone makes
  * within-block pairs grow quadratically with the corpus. Pass 1
  * blocks on a HIGH-CARDINALITY stable name key (the name minus its
  * volatile last character — key count scales with the corpus, so
  * block populations stay constant); pass 2 is a per-block SORTED
  * NEIGHBORHOOD (Hernández–Stolfo 1995) inside the exact-cents block:
  * records rank by name within their block and only pairs within
  * [[SnBudget]] rank positions are compared — ≤ 2·[[SnBudget]]
  * comparisons per record no matter how hot the block. The passes are
  * DISJOINT by construction (pass 2 requires the name keys to
  * differ), so the union needs no distinct. Output is cut at the
  * non-match floor so it stays match-sized. Blocking recall (a true
  * pair perturbed in BOTH the name key and beyond the cents window is
  * never compared) is the documented F-S trade — each pass covers the
  * other's perturbation. A skewed key goes through
  * [[Skew.saltedJoin]].
  *
  * m/u estimation: [[patternCounts]] folds candidates to the ≤2^F
  * agreement-pattern histogram (exact longs, mergeable by addition);
  * [[emFit]] runs the classic EM over that bounded table driver-side —
  * the corpus is never rescanned per iteration.
  */
object Linkage {

  /** Per-field conditional agreement probabilities (m, u) and the
    * derived integer micro-nat weights.
    */
  final case class Field(name: String, m: Double, u: Double) {
    val wAgree: Long = math.round(math.log(m / u) * 1e6)
    val wDisagree: Long = math.round(math.log((1.0 - m) / (1.0 - u)) * 1e6)
  }

  /** The fixture's field model: name is near-unique (tiny u), exact
    * balance cents nearly so; nation and segment are weak evidence.
    */
  val NameF = Field("name", 0.92, 0.0005)
  val CentsF = Field("cents", 0.95, 0.002)
  val NationF = Field("nation", 0.86, 0.04)
  val SegF = Field("seg", 0.67, 0.2)
  val AllFields: Seq[Field] = Seq(NameF, CentsF, NationF, SegF)

  /** Verdict thresholds in micro-nats: ≥ upper → match, ≥ lower →
    * possible (clerical review); below lower is dropped as non-match.
    */
  val Upper = 10000000L
  val Lower = 0L

  /** Sorted-neighborhood comparison budget: within an exact-cents
    * block, a record is compared only to the other side's records
    * within this many name-rank positions — the per-record candidate
    * bound that keeps a hot block from going quadratic. (Declared
    * before [[candSql]], whose initializer embeds it.)
    */
  val SnBudget = 8

  private def w(f: Field, agree: Column): Column =
    when(agree, lit(f.wAgree)).otherwise(lit(f.wDisagree))

  private def wSql(f: Field, agree: String): String =
    s"CASE WHEN $agree THEN ${f.wAgree} ELSE ${f.wDisagree} END"

  /** Score + verdict over a candidate-pair frame carrying boolean
    * agreement columns named after each field. Pure projection — the
    * caller owns blocking.
    */
  def score(cand: DataFrame, fields: Seq[Field] = AllFields): DataFrame = {
    val total = fields.map(f => w(f, col("a_" + f.name))).reduce(_ + _)
    cand.withColumn("score_micro", total)
      .withColumn("verdict",
        when(col("score_micro") >= Upper, lit("match"))
          .when(col("score_micro") >= Lower, lit("possible"))
          .otherwise(lit("nonmatch")))
  }

  /** Exact agreement-pattern histogram: one partial-agg groupBy to
    * ≤ 2^F rows `(pattern bits…, n)` — the sufficient statistic EM
    * needs, mergeable across batches by addition.
    */
  def patternCounts(cand: DataFrame, fields: Seq[Field] = AllFields): DataFrame =
    cand.groupBy(fields.map(f => col("a_" + f.name)): _*)
      .agg(count(lit(1)).as("n"))

  /** Classic F-S EM over the bounded pattern table (driver-side — the
    * table is ≤ 2^F rows by construction, the bounded-statistic
    * contract). Returns (p, m per field, u per field) after `iters`
    * rounds from the given start point. Patterns are (bits, count).
    */
  def emFit(patterns: Seq[(Seq[Boolean], Long)], fields: Int, iters: Int = 50,
    p0: Double = 0.1, m0: Double = 0.9, u0: Double = 0.1)
    : (Double, Array[Double], Array[Double]) = {
    var p = p0
    var m = Array.fill(fields)(m0)
    var u = Array.fill(fields)(u0)
    val total = patterns.map(_._2).sum.toDouble
    var it = 0
    while (it < iters) {
      // E-step: P(match | pattern) per pattern row
      val g = patterns.map { case (bits, n) =>
        var pm = p; var pu = 1.0 - p
        var f = 0
        while (f < fields) {
          if (bits(f)) { pm *= m(f); pu *= u(f) }
          else { pm *= 1.0 - m(f); pu *= 1.0 - u(f) }
          f += 1
        }
        (bits, n, pm / (pm + pu))
      }
      // M-step
      val wm = g.map { case (_, n, gi) => n * gi }.sum
      val wu = g.map { case (_, n, gi) => n * (1.0 - gi) }.sum
      p = wm / total
      m = Array.tabulate(fields) { f =>
        g.filter(_._1(f)).map { case (_, n, gi) => n * gi }.sum / wm
      }
      u = Array.tabulate(fields) { f =>
        g.filter(_._1(f)).map { case (_, n, gi) => n * (1.0 - gi) }.sum / wu
      }
      it += 1
    }
    (p, m, u)
  }

  /** The B-side "vendor registry": every customer re-keyed (+100000)
    * with deterministic field noise — every 5th name's last char
    * mangled, every 7th nation off by one, every 3rd segment unknown.
    * Balance survives intact (the block key must — the documented F-S
    * blocking trade). SQL mirror: CTE `registry`.
    */
  def registry(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(
      (col("c_custkey") + 100000L).as("b_id"),
      when(col("c_custkey") % 5 === 0,
        concat(expr("substring(c_name, 1, length(c_name)-1)"), lit("X")))
        .otherwise(col("c_name")).as("b_name"),
      when(col("c_custkey") % 7 === 0, (col("c_nationkey") + 1) % 25)
        .otherwise(col("c_nationkey")).cast("long").as("b_nation"),
      when(col("c_custkey") % 3 === 0, lit("UNKNOWN"))
        .otherwise(col("c_mktsegment")).as("b_seg"),
      floor(col("c_acctbal") * 100 + 0.5).cast("long").as("b_cents"))

  val registrySql: String =
    """registry AS (
      |  SELECT c_custkey + 100000 AS b_id,
      |         CASE WHEN c_custkey % 5 = 0
      |              THEN substr(c_name, 1, length(c_name)-1) || 'X'
      |              ELSE c_name END AS b_name,
      |         (CASE WHEN c_custkey % 7 = 0 THEN (c_nationkey + 1) % 25
      |               ELSE c_nationkey END)::BIGINT AS b_nation,
      |         CASE WHEN c_custkey % 3 = 0 THEN 'UNKNOWN'
      |              ELSE c_mktsegment END AS b_seg,
      |         floor(c_acctbal * 100 + 0.5)::BIGINT AS b_cents
      |  FROM customer
      |)""".stripMargin

  /** Shared oracle CTE chain mirroring [[candidates]]: raw sides
    * `a`/`b`, name keys + per-cents-block name ranks, and the disjoint
    * two-pass union (name-key equi-join ∪ cents sorted-neighborhood
    * restricted to name-key mismatches).
    */
  private val candSql: String =
    s"""a AS (
       |  SELECT c_custkey::BIGINT AS a_id, c_name AS nm,
       |         c_nationkey::BIGINT AS nat, c_mktsegment AS seg,
       |         floor(c_acctbal * 100 + 0.5)::BIGINT AS cents
       |  FROM customer
       |), b AS (
       |  SELECT * FROM registry
       |), an AS (
       |  SELECT a.*, substr(nm, 1, length(nm)-1) AS nkey,
       |         row_number() OVER (PARTITION BY cents ORDER BY nm, a_id) AS rk
       |  FROM a
       |), bn AS (
       |  SELECT b.*, substr(b_name, 1, length(b_name)-1) AS nkey,
       |         row_number() OVER (PARTITION BY b_cents ORDER BY b_name, b_id) AS rk
       |  FROM b
       |), cand AS (
       |  SELECT a_id, b_id, nm, b_name, cents, b_cents, nat, b_nation, seg, b_seg
       |  FROM an JOIN bn USING (nkey)
       |  UNION ALL
       |  SELECT an.a_id, bn.b_id, an.nm, bn.b_name, an.cents, bn.b_cents,
       |         an.nat, bn.b_nation, an.seg, bn.b_seg
       |  FROM an JOIN bn ON bn.b_cents = an.cents
       |   AND abs(an.rk - bn.rk) <= $SnBudget AND an.nkey <> bn.nkey
       |)""".stripMargin

  /** The house side of the link: `(a_id, nm, nat, seg, cents)`. */
  def houseSide(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(
      col("c_custkey").cast("long").as("a_id"),
      col("c_name").as("nm"), col("c_nationkey").cast("long").as("nat"),
      col("c_mktsegment").as("seg"),
      floor(col("c_acctbal") * 100 + 0.5).cast("long").as("cents"))

  private val aNkey = expr("substring(nm, 1, length(nm)-1)")
  private val bNkey = expr("substring(b_name, 1, length(b_name)-1)")

  /** Multi-pass blocked candidate pairs with BOUNDED per-record cost,
    * carrying the raw fields of both sides. Pass 1: equi-join on the
    * stable name key (name minus its volatile last char — cardinality
    * scales with the corpus, so blocks don't grow with it; catches
    * every pair whose name survives up to a last-char edit, any
    * cents). Pass 2: per-cents-block sorted neighborhood — both sides
    * rank by (name, id) inside their exact-cents block and only pairs
    * within [[SnBudget]] rank positions are compared, via a rank-bucket
    * equi-join (the a-side fans out to 3 bucket keys, so a record
    * meets ≤ 3·[[SnBudget]] partners however hot the block; catches
    * name-perturbed pairs whose cents survive). Pass 2 requires the
    * name keys to DIFFER, so the passes are disjoint and the union
    * needs no dedup shuffle.
    */
  def candidates(a: DataFrame, b: DataFrame): DataFrame = {
    val wA = Window.partitionBy(col("cents")).orderBy(col("nm"), col("a_id"))
    val wB = Window.partitionBy(col("b_cents")).orderBy(col("b_name"), col("b_id"))
    val an = a.withColumn("a_nkey", aNkey)
      .withColumn("a_rk", row_number().over(wA).cast("long"))
    val bn = b.withColumn("b_nkey", bNkey)
      .withColumn("b_rk", row_number().over(wB).cast("long"))
    val fields = Seq("a_id", "b_id", "nm", "b_name", "cents", "b_cents",
      "nat", "b_nation", "seg", "b_seg").map(col)
    val pass1 = an.join(bn, col("a_nkey") === col("b_nkey"))
      .select(fields: _*)
    val bkOf = (rk: Column) => floor(rk / SnBudget).cast("long")
    val aK = an.withColumn("a_bk",
      explode(array(bkOf(col("a_rk")) - 1, bkOf(col("a_rk")),
        bkOf(col("a_rk")) + 1)))
    val bK = bn.withColumn("b_bk", bkOf(col("b_rk")))
    val pass2 = aK.join(bK,
      col("cents") === col("b_cents") && col("a_bk") === col("b_bk") &&
        abs(col("a_rk") - col("b_rk")) <= SnBudget &&
        col("a_nkey") =!= col("b_nkey"))
      .select(fields: _*)
    pass1.unionByName(pass2)
  }

  /** Stream-compatible candidate generation: the same two passes with
    * pass 2 degraded from sorted-neighborhood to a plain exact-cents
    * equi-join (a rank over the incoming stream isn't expressible
    * statelessly) — identical pairs whenever every cents block fits
    * the [[SnBudget]] window, which LinkageSpec asserts on the
    * fixture. Both passes are stream-static joins: no state store, no
    * watermark, append mode.
    */
  def candidatesEqui(a: DataFrame, b: DataFrame): DataFrame = {
    val an = a.withColumn("a_nkey", aNkey)
    val bn = b.withColumn("b_nkey", bNkey)
    val fields = Seq("a_id", "b_id", "nm", "b_name", "cents", "b_cents",
      "nat", "b_nation", "seg", "b_seg").map(col)
    val pass1 = bn.join(an, col("a_nkey") === col("b_nkey"))
      .select(fields: _*)
    val pass2 = bn.join(an,
      col("cents") === col("b_cents") && col("a_nkey") =!= col("b_nkey"))
      .select(fields: _*)
    pass1.unionByName(pass2)
  }

  /** Agreement bits + scored verdicts over a raw-field candidate
    * frame, cut at the review floor.
    */
  private def scoredFrom(cand: DataFrame): DataFrame =
    score(cand.select(col("a_id"), col("b_id"),
      (col("nm") === col("b_name")).as("a_name"),
      (col("cents") === col("b_cents")).as("a_cents"),
      (col("nat") === col("b_nation")).as("a_nation"),
      (col("seg") === col("b_seg")).as("a_seg")))
      .filter(col("score_micro") >= Lower)
      .select(col("a_id"), col("b_id"), col("a_name"), col("a_cents"),
        col("a_nation"), col("a_seg"), col("score_micro"), col("verdict"))

  /** Bounded-blocking candidates + scored verdicts, cut at the review
    * floor — the batch linkage.
    */
  def linked(a: DataFrame, b: DataFrame): DataFrame =
    scoredFrom(candidates(a, b))

  /** [[candidatesEqui]] + the same scoring — shared verbatim by
    * [[graft.streaming.StreamingLinkage]] (`b` may be a streaming
    * frame) and its batch parity check.
    */
  def linkedEqui(a: DataFrame, b: DataFrame): DataFrame =
    scoredFrom(candidatesEqui(a, b))

  /** One-to-one assignment by MUTUAL best match — the classic F-S
    * post-step: scoring emits every candidate pair above the floor,
    * but an entity resolution wants each record matched at most once;
    * a pair survives iff each side is the other's argmax (score desc,
    * partner id asc). Competing pairs from block collisions (the
    * accidental cents agreements) lose to the true twin wherever the
    * twin outranks them — and a record whose best partner prefers
    * someone else correctly matches NOTHING (no transitive chaining,
    * unlike a greedy global assignment). Two partial-agg argmax folds
    * (`max(struct)` — no window) + two id-keyed joins (bucket by id
    * at scale).
    */
  def mutualBest(scored: DataFrame): DataFrame = {
    val bestA = scored.groupBy(col("a_id"))
      .agg(max(struct(col("score_micro").as("s"), (-col("b_id")).as("nb")))
        .as("m"))
      .select(col("a_id"), (-col("m.nb")).as("b_id"))
    val bestB = scored.groupBy(col("b_id"))
      .agg(max(struct(col("score_micro").as("s"), (-col("a_id")).as("na")))
        .as("m"))
      .select(col("b_id"), (-col("m.na")).as("a_id"))
    scored
      .join(bestA, Seq("a_id", "b_id"), "left_semi")
      .join(bestB, Seq("a_id", "b_id"), "left_semi")
  }

  /** q_linkage_best — [[mutualBest]] over the scored fixture pairs. */
  def linkageBest(s: SparkSession, d: String): DataFrame =
    mutualBest(linked(houseSide(s, d), registry(s, d)))
      .select(col("a_id"), col("b_id"), col("score_micro"), col("verdict"))
      .orderBy(col("a_id"), col("b_id"))

  val linkageBestSql: String = {
    val total = Seq(
      wSql(NameF, "a_name"), wSql(CentsF, "a_cents"),
      wSql(NationF, "a_nation"), wSql(SegF, "a_seg")).mkString(" + ")
    s"""WITH $registrySql,
       |$candSql,
       |agreed AS (
       |  SELECT a_id, b_id,
       |         nm = b_name AS a_name, cents = b_cents AS a_cents,
       |         nat = b_nation AS a_nation, seg = b_seg AS a_seg
       |  FROM cand
       |), scored AS (
       |  SELECT a_id, b_id, ($total)::BIGINT AS score_micro
       |  FROM agreed
       |  WHERE ($total)::BIGINT >= $Lower
       |), best_a AS (
       |  SELECT a_id, -(max({'s': score_micro, 'nb': -b_id}).nb) AS b_id
       |  FROM scored GROUP BY a_id
       |), best_b AS (
       |  SELECT b_id, -(max({'s': score_micro, 'na': -a_id}).na) AS a_id
       |  FROM scored GROUP BY b_id
       |)
       |SELECT s.a_id, s.b_id, s.score_micro,
       |       CASE WHEN s.score_micro >= $Upper THEN 'match'
       |            WHEN s.score_micro >= $Lower THEN 'possible'
       |            ELSE 'nonmatch' END AS verdict
       |FROM scored s
       |JOIN best_a ON best_a.a_id = s.a_id AND best_a.b_id = s.b_id
       |JOIN best_b ON best_b.b_id = s.b_id AND best_b.a_id = s.a_id
       |ORDER BY s.a_id, s.b_id""".stripMargin
  }

  /** Graded name-agreement weights for [[linkedFuzzy]] (micro-nats):
    * the F-S comparator generalized from binary to LEVELS (Winkler's
    * string-comparator extension) — exact / close (Levenshtein ≤ 2,
    * the typo band) / far, each with its own ln(m/u). A 1-char mangle
    * is overwhelmingly more likely under a true match than across
    * records, so 'close' carries strong positive weight where the
    * binary comparator threw the evidence away.
    */
  val NameExactW: Long = NameF.wAgree
  val NameCloseW: Long = math.round(math.log(0.08 / 0.002) * 1e6)
  val NameFarW: Long = math.round(math.log(0.02 / 0.9975) * 1e6)

  /** Graded-comparator linkage: the name field contributes by
    * Levenshtein band (0 / ≤2 / far) instead of equality; other
    * fields and the blocking are [[linked]]'s. The payoff is the
    * mangled-twin band: a 1-char name edit plus the cents agreement
    * now clears the MATCH threshold instead of landing in clerical
    * review. Levenshtein cost is bounded by the block (candidate
    * pairs only, never corpus²) — the [[EditSim]] discipline.
    */
  def linkedFuzzy(a: DataFrame, b: DataFrame): DataFrame = {
    // thresholded levenshtein (banded O(len·2), early exit, -1 beyond
    // the close band): the comparator only needs exact / ≤2 / far, so
    // the full O(len²) distance on every far pair — the overwhelming
    // majority of block candidates — is pure waste. `name_lev` is
    // therefore BANDED in the output: the exact distance inside the
    // typo band, -1 for far (mirrored in the oracle SQL).
    val cand = candidates(a, b)
      .select(col("a_id"), col("b_id"),
        levenshtein(col("nm"), col("b_name"), 2).cast("long").as("name_lev"),
        (col("cents") === col("b_cents")).as("a_cents"),
        (col("nat") === col("b_nation")).as("a_nation"),
        (col("seg") === col("b_seg")).as("a_seg"))
    val nameW = when(col("name_lev") === 0, lit(NameExactW))
      .when(col("name_lev") > 0, lit(NameCloseW))
      .otherwise(lit(NameFarW))
    val total = nameW + w(CentsF, col("a_cents")) +
      w(NationF, col("a_nation")) + w(SegF, col("a_seg"))
    cand.withColumn("score_micro", total)
      .withColumn("verdict",
        when(col("score_micro") >= Upper, lit("match"))
          .when(col("score_micro") >= Lower, lit("possible"))
          .otherwise(lit("nonmatch")))
      .filter(col("score_micro") >= Lower)
      .select(col("a_id"), col("b_id"), col("name_lev"), col("a_cents"),
        col("a_nation"), col("a_seg"), col("score_micro"), col("verdict"))
  }

  /** q_linkage_fuzzy — [[linkedFuzzy]] over the same fixture. */
  def linkageFuzzy(s: SparkSession, d: String): DataFrame =
    linkedFuzzy(houseSide(s, d), registry(s, d))
      .orderBy(col("a_id"), col("b_id"))

  val linkageFuzzySql: String = {
    // name_lev is banded (-1 beyond the typo band) to mirror the Spark
    // side's thresholded levenshtein; the weight keys off the raw lev
    val nameW =
      s"""CASE WHEN lev = 0 THEN $NameExactW
         |            WHEN lev <= 2 THEN $NameCloseW
         |            ELSE $NameFarW END""".stripMargin
    val total = Seq(nameW, wSql(CentsF, "a_cents"),
      wSql(NationF, "a_nation"), wSql(SegF, "a_seg")).mkString(" + ")
    s"""WITH $registrySql,
       |$candSql,
       |agreed AS (
       |  SELECT a_id, b_id,
       |         levenshtein(nm, b_name)::BIGINT AS lev,
       |         cents = b_cents AS a_cents,
       |         nat = b_nation AS a_nation, seg = b_seg AS a_seg
       |  FROM cand
       |), scored AS (
       |  SELECT *, CASE WHEN lev <= 2 THEN lev ELSE -1 END AS name_lev,
       |         ($total)::BIGINT AS score_micro FROM agreed
       |)
       |SELECT a_id, b_id, name_lev, a_cents, a_nation, a_seg, score_micro,
       |       CASE WHEN score_micro >= $Upper THEN 'match'
       |            WHEN score_micro >= $Lower THEN 'possible'
       |            ELSE 'nonmatch' END AS verdict
       |FROM scored WHERE score_micro >= $Lower
       |ORDER BY a_id, b_id""".stripMargin
  }

  /** q_linkage — link the customer table against the noisy registry:
    * bounded multi-pass blocking (stable name key ∪ exact-cents sorted
    * neighborhood), score the four-field agreement vector in exact
    * micro-nats, keep pairs at or above the review floor. A clean true
    * pair lands 'match'; a name-mangled one lands 'possible' (exactly
    * the clerical-review semantics); cross-pairs only surface on
    * accidental cents collisions.
    */
  def linkage(s: SparkSession, d: String): DataFrame =
    linked(houseSide(s, d), registry(s, d))
      .orderBy(col("a_id"), col("b_id"))

  val linkageSql: String = {
    val total = Seq(
      wSql(NameF, "a_name"), wSql(CentsF, "a_cents"),
      wSql(NationF, "a_nation"), wSql(SegF, "a_seg")).mkString(" + ")
    s"""WITH $registrySql,
       |$candSql,
       |agreed AS (
       |  SELECT a_id, b_id,
       |         nm = b_name AS a_name, cents = b_cents AS a_cents,
       |         nat = b_nation AS a_nation, seg = b_seg AS a_seg
       |  FROM cand
       |), scored AS (
       |  SELECT *, ($total)::BIGINT AS score_micro FROM agreed
       |)
       |SELECT a_id, b_id, a_name, a_cents, a_nation, a_seg, score_micro,
       |       CASE WHEN score_micro >= $Upper THEN 'match'
       |            WHEN score_micro >= $Lower THEN 'possible'
       |            ELSE 'nonmatch' END AS verdict
       |FROM scored WHERE score_micro >= $Lower
       |ORDER BY a_id, b_id""".stripMargin
  }
}
