package graft.operators

import graft.Tables
import graft.functions.TextSim
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT set-similarity self-join via prefix filtering — the
  * AllPairs/PPJoin family (Bayardo et al. WWW'07, Xiao et al.
  * WWW'08) re-expressed as three DataFrame shuffles. Where the LSH
  * detectors ([[Dedup.minhashPairs]] and friends) trade recall for
  * cost, this join is complete: every pair with exact shingle
  * Jaccard ≥ τ is produced, with no probabilistic miss — the ground
  * truth the detector audit ([[detectorEval]]) grades against, and
  * the right tool when a contract (licensing, eval-set isolation)
  * needs *provable* completeness rather than a high-probability one.
  *
  * The theorem: order all shingles by a global total order (here
  * ascending document frequency, ties on the shingle string — rarest
  * first). If J(a,b) ≥ τ then |a∩b| ≥ ⌈τ·|a|⌉ (the union is at least
  * |a| big), so the smallest common shingle must sit within the first
  * |a| − ⌈τ·|a|⌉ + 1 entries of a's ordering — else all ≥⌈τ·|a|⌉
  * common shingles would have to fit in the last ⌈τ·|a|⌉ − 1 slots —
  * and symmetrically for b. Joining only those short per-doc
  * PREFIXES on equal shingle therefore finds every qualifying pair;
  * exact-Jaccard verification on the candidates discards the rest.
  * τ is kept as the rational [[TauNum]]/[[TauDen]] so both engines
  * compute ⌈τ·n⌉ in integer arithmetic (a binary-double 0.8·n can
  * round the wrong way at n ≡ 0 mod 5).
  *
  * Scale shape: df ordering makes each prefix the document's RAREST
  * shingles — at τ = 0.8 a prefix is ≤ |sh|/5 + 1 postings, and a
  * viral (stopword-like) shingle enters a prefix only when a doc has
  * nothing rarer, so prefix-bucket sizes stay near df≈1 in practice.
  * The df join is shuffle_hash-pinned ([[Dedup.ngramPairs]]'s
  * reasoning: the df table is vocabulary-sized and can never
  * broadcast at corpus scale), the per-doc rank window partitions by
  * doc_id (doc-bounded state), and the prefix self-join is salted
  * ([[Skew.saltedSelfJoin]]). Degenerate corpora (every doc a clone)
  * produce quadratic PAIRS — that cost is output-bound, not
  * scan-bound, which is the best any complete join can do.
  *
  * Reference tie-in: `Notion_openai_vector_etl.py:178` skips
  * re-embedding on exact content-hash equality only; this join is
  * the exact *near*-equality form of the same skip decision.
  */
object PrefixJoin {

  /** Jaccard threshold τ = [[TauNum]]/[[TauDen]] as an exact rational. */
  val TauNum = 4
  /** See [[TauNum]]. */
  val TauDen = 5

  /** Complete τ-similar pairs `(a_id, b_id, jaccard)` of any
    * `(doc_id, text)` frame, without the presentation sort.
    */
  def prefixPairsRaw(docs: DataFrame): DataFrame =
    prefixPairsFromShingles(Dedup.shingleDocs(docs).persist())

  /** [[prefixPairsRaw]] over an already-shingled (ideally persisted)
    * `(doc_id, sh)` frame — the shared-barrier entry
    * [[detectorEval]] uses so the detector and the truth join pay the
    * shingle pass ONCE.
    */
  def prefixPairsFromShingles(sh: DataFrame): DataFrame = {
    val postings = sh.select(col("doc_id"),
      size(col("sh")).cast("long").as("n"), explode(col("sh")).as("shingle"))
    val dfreq = postings.groupBy(col("shingle"))
      .agg(count(lit(1)).as("df"))
    val ranked = postings.join(dfreq.hint("shuffle_hash"), "shingle")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("shingle"))))
    // prefix length n − ⌈τn⌉ + 1, integer-exact: ⌈τn⌉ = (TauNum·n + TauDen − 1) div TauDen
    val prefix = ranked
      .filter(col("rk") <=
        col("n") - expr(s"($TauNum * n + ${TauDen - 1}) div $TauDen") + 1)
      .select(col("doc_id"), col("shingle"))
    val cand = Skew.saltedSelfJoin(prefix, "doc_id", Seq("shingle"), Dedup.LshSalt)
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
    Dedup.verifyJaccard(cand, sh.select(col("doc_id"), col("sh")))
  }

  /** [[prefixPairsRaw]] with the `(a_id, b_id)` presentation sort. */
  def prefixPairs(docs: DataFrame): DataFrame =
    prefixPairsRaw(docs).orderBy(col("a_id"), col("b_id"))

  /** q_dedup_prefix — the complete τ=0.8 pair set on the dup-injected
    * corpus (the exact counterpart of `q_dedup_minhash`).
    */
  def prefixQuery(s: SparkSession, d: String): DataFrame =
    prefixPairs(Tables.docsAug(s, d))

  /** Prefix-filter CTE chain over a `shingled(doc_id, sh)` relation;
    * ends in `truth(a_id, b_id, jaccard)`.
    */
  private val prefixBodySql: String =
    s"""postings AS (
       |  SELECT doc_id, unnest(sh) AS shingle FROM shingled
       |), dfreq AS (
       |  SELECT shingle, count(*) AS df FROM postings GROUP BY shingle
       |), ranked AS (
       |  SELECT p.doc_id, p.shingle, len(s.sh) AS n,
       |         row_number() OVER (PARTITION BY p.doc_id ORDER BY d.df, p.shingle) AS rk
       |  FROM postings p
       |  JOIN dfreq d ON d.shingle = p.shingle
       |  JOIN shingled s ON s.doc_id = p.doc_id
       |), prefix AS (
       |  SELECT doc_id, shingle FROM ranked
       |  WHERE rk <= n - (($TauNum*n + ${TauDen - 1})//$TauDen) + 1
       |), pcand AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM prefix a JOIN prefix b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |), truth AS (
       |  SELECT c.a_id, c.b_id, ${Dedup.jaccardSql} AS jaccard
       |  FROM pcand c
       |  JOIN shingled x ON x.doc_id = c.a_id
       |  JOIN shingled y ON y.doc_id = c.b_id
       |  WHERE ${Dedup.jaccardSql} >= 0.8
       |)""".stripMargin

  val prefixSql: String =
    s"""WITH ${Dedup.shingledSql},
       |$prefixBodySql
       |SELECT a_id, b_id, jaccard FROM truth
       |ORDER BY a_id, b_id""".stripMargin

  /** sf1-gate shared materialization (the [[Dedup.walkLabelsTableSql]]
    * discipline): the complete τ=0.8 prefix-join pair set, computed
    * ONCE as temp table `prefix_truth` — its canonical derivation is
    * the single most expensive oracle at sf1 (the pcand self-join over
    * a closed-vocab corpus' prefix postings) and TWO oracles consume
    * it (`q_dedup_prefix` verbatim, `q_dedup_eval` as the truth side
    * of the detector audit). String-built from the same fragments as
    * the canonical SQL; the driver's gate still runs the
    * self-contained form.
    */
  val prefixTruthTableSql: String =
    s"""WITH ${Dedup.shingledSql},
       |$prefixBodySql
       |SELECT a_id, b_id, jaccard FROM truth""".stripMargin

  val prefixSqlServed: String =
    """SELECT a_id, b_id, jaccard FROM prefix_truth
      |ORDER BY a_id, b_id""".stripMargin

  /** q_dedup_eval — the detector audit: grade the probabilistic
    * minhash-LSH detector against the complete prefix-join pair set.
    * One row: truth/detected/hit/missed counts, recall and precision.
    * Because the detector exact-verifies its candidates, precision is
    * 1 by construction whenever the join above is complete — the
    * audit MEASURES that rather than assuming it (a broken band
    * slice or a verify-threshold drift shows up here first). Recall
    * below 1 is the quantified LSH miss rate (pairs whose 16×4 band
    * signatures never collided).
    *
    * Scale: both pair sets are near-dup-sized (not corpus-sized);
    * the semi-join and the three 1-row aggregates ride on them.
    */
  def detectorEval(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.docsAug(s, d)
    // ONE shingle barrier for both arms: the exact join and the LSH
    // detector consume the same persisted frame instead of paying the
    // tokenize+shingle pass twice
    val sh = Dedup.shingleDocs(docs).persist()
    val truth = prefixPairsFromShingles(sh)
      .select(col("a_id"), col("b_id")).persist()
    val det = Dedup.minhashPairsRaw(Dedup.minhashSignatures(sh))
      .select(col("a_id"), col("b_id")).persist()
    val hit = det.join(truth, Seq("a_id", "b_id"), "left_semi")
    truth.agg(count(lit(1)).cast("long").as("n_truth"))
      .crossJoin(det.agg(count(lit(1)).cast("long").as("n_detected")))
      .crossJoin(hit.agg(count(lit(1)).cast("long").as("n_hit")))
      .select(lit("minhash_lsh").as("detector"),
        col("n_truth"), col("n_detected"), col("n_hit"),
        (col("n_truth") - col("n_hit")).as("n_missed"),
        TextSim.r6(col("n_hit").cast("double") / col("n_truth")).as("recall"),
        TextSim.r6(col("n_hit").cast("double") / col("n_detected"))
          .as("precision"))
  }

  val detectorEvalSql: String =
    s"""WITH ${Dedup.shingledSql},
       |${Dedup.minhashBodySql},
       |$prefixBodySql,
       |counts AS (
       |  SELECT (SELECT count(*) FROM truth) AS n_truth,
       |         (SELECT count(*) FROM verified) AS n_detected,
       |         (SELECT count(*) FROM verified v JOIN truth t
       |            ON v.a_id = t.a_id AND v.b_id = t.b_id) AS n_hit
       |)
       |SELECT 'minhash_lsh' AS detector,
       |       n_truth::BIGINT AS n_truth,
       |       n_detected::BIGINT AS n_detected,
       |       n_hit::BIGINT AS n_hit,
       |       (n_truth - n_hit)::BIGINT AS n_missed,
       |       ${TextSim.r6Sql("n_hit::DOUBLE / n_truth")} AS recall,
       |       ${TextSim.r6Sql("n_hit::DOUBLE / n_detected")} AS precision
       |FROM counts""".stripMargin

  /** Served twin: both pair sets read from the shared temp tables —
    * the same counts readout as [[detectorEvalSql]]. */
  val detectorEvalSqlServed: String =
    s"""WITH counts AS (
       |  SELECT (SELECT count(*) FROM prefix_truth) AS n_truth,
       |         (SELECT count(*) FROM minhash_verified) AS n_detected,
       |         (SELECT count(*) FROM minhash_verified v JOIN prefix_truth t
       |            ON v.a_id = t.a_id AND v.b_id = t.b_id) AS n_hit
       |)
       |SELECT 'minhash_lsh' AS detector,
       |       n_truth::BIGINT AS n_truth,
       |       n_detected::BIGINT AS n_detected,
       |       n_hit::BIGINT AS n_hit,
       |       (n_truth - n_hit)::BIGINT AS n_missed,
       |       ${TextSim.r6Sql("n_hit::DOUBLE / n_truth")} AS recall,
       |       ${TextSim.r6Sql("n_hit::DOUBLE / n_detected")} AS precision
       |FROM counts""".stripMargin
}
