package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Edit-distance (Levenshtein) near-duplicate detection — the
  * unit-cost complement of the token-set dedup family
  * ([[Dedup.minhash]]/[[Dedup.ngramJaccard]]): Jaccard over shingles
  * is blind to small in-word edits and character-level corruption,
  * while edit distance prices every insert/delete/substitute — the
  * right similarity for short texts (titles, queries, code lines)
  * where a 3-gram shingle set is degenerate. Reference: the crawl
  * re-fetches pages whose content "changed" by any byte
  * (Notion_vector_etl hash compare, Notion_openai_vector_etl.py:189-215);
  * this operator grades HOW changed.
  *
  * Scale shape (the [[Dedup.minhash]] discipline, with prefix
  * blocking standing in for LSH bands): the self-join shuffles only
  * `(doc_id, prefix-key)` rows — never the text; candidate pairs then
  * re-join the text by id (two keyed joins) and the O(len²) distance
  * runs ONCE per candidate pair. Blocking by exact `prefixLen`-char
  * prefix is sound for the near-dup class this targets (edits/append
  * drift AFTER a shared head — the overwhelming shape of re-crawled
  * page revisions); a deletion inside the first `prefixLen` chars
  * moves a pair out of the block, the standard blocking trade-off
  * ([[editPairsTwoSided]] runs the symmetric suffix-blocked pass and
  * unions — only a pair edited at BOTH ends escapes). The band
  * self-join is salted
  * ([[Skew.saltedSelfJoin]]) so one viral prefix (boilerplate heads)
  * cannot straggle a reducer.
  */
object EditSim {

  /** Blocking-prefix length (chars). */
  val PrefixLen = 32

  /** Max edit distance for a reported pair (the near-dup suffix
    * fixture appends 29 chars, comfortably inside).
    */
  val MaxDist = 32

  /** Candidate near-dup pairs over any `(doc_id, text)` frame:
    * `(doc_a, doc_b, dist)` with `doc_a < doc_b`, both sharing their
    * first `prefixLen` chars and `levenshtein(text_a, text_b) <=
    * maxDist`.
    */
  def editPairs(docs: DataFrame, prefixLen: Int = PrefixLen,
    maxDist: Int = MaxDist): DataFrame =
    editPairsBlocked(docs, substring(col("text"), 1, prefixLen), maxDist)

  /** [[editPairs]] with a caller-chosen blocking key over `text` —
    * `substring(text, 1, n)` for the head-anchored pass,
    * `substring(text, -n, n)` for the symmetric suffix-anchored pass
    * that catches head-edited pairs (union the two passes and
    * `dropDuplicates("doc_a","doc_b")` for two-sided coverage; a pair
    * must then survive an edit at one END, the blocked analogue of
    * banding).
    */
  def editPairsBlocked(docs: DataFrame, blockKey: Column,
    maxDist: Int = MaxDist): DataFrame = {
    val keyed = docs.select(col("doc_id"), blockKey.as("k"))
    // bare ids through the salted self-join; text never rides it
    val cand = Skew.saltedSelfJoin(keyed, "doc_id", Seq("k"), salt = 4)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val texts = docs.select(col("doc_id"), col("text"))
    // thresholded levenshtein: the banded O(len·maxDist) form with
    // early exit (returns -1 above the bound) — pairs beyond maxDist
    // are filtered anyway, so the full O(len²) table is wasted work
    // exactly on the pairs that cost the most
    cand
      .join(texts.select(col("doc_id").as("doc_a"), col("text").as("ta")),
        "doc_a")
      .join(texts.select(col("doc_id").as("doc_b"), col("text").as("tb")),
        "doc_b")
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("ta"), col("tb"), maxDist).cast("long").as("dist"))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
  }

  /** Two-sided pass: prefix-blocked ∪ suffix-blocked candidates, each
    * pair once. Catches both tail-edited (shared head) and head-edited
    * (shared tail) near-dups; only a pair edited at BOTH ends inside
    * the block windows escapes.
    */
  def editPairsTwoSided(docs: DataFrame, blockLen: Int = PrefixLen,
    maxDist: Int = MaxDist): DataFrame =
    editPairsBlocked(docs, substring(col("text"), 1, blockLen), maxDist)
      .unionAll(editPairsBlocked(docs,
        substring(col("text"), -blockLen, blockLen), maxDist))
      .dropDuplicates("doc_a", "doc_b")

  /** q_edit_dedup — [[editPairs]] over the duplicate-injected corpus:
    * exact copies land at dist 0, the appended-suffix near copies at
    * the suffix length.
    */
  def editDedup(s: SparkSession, d: String): DataFrame =
    editPairs(Tables.docsAug(s, d)).orderBy(col("doc_a"), col("doc_b"))

  val editDedupSql: String =
    s"""WITH ${Tables.docsAugSql},
       |keyed AS (
       |  SELECT doc_id, text, substr(text, 1, $PrefixLen) AS k FROM docs_aug
       |)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |       levenshtein(a.text, b.text)::BIGINT AS dist
       |FROM keyed a JOIN keyed b ON a.k = b.k AND a.doc_id < b.doc_id
       |WHERE levenshtein(a.text, b.text) <= $MaxDist
       |ORDER BY doc_a, doc_b""".stripMargin
}
