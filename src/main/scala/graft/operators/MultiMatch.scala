package graft.operators

import graft.Tables
import graft.functions.AhoCorasick
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-pattern dictionary matching over the corpus — the
  * [[graft.functions.AhoCorasick]] kernel as a query. One pass per
  * document finds every occurrence of every dictionary phrase
  * (substring semantics, overlaps counted), at a cost independent of
  * dictionary size — the screen [[Blocklist]]'s per-term comparison
  * fold and a regex alternation both stop scaling at:
  * PII gazetteers, URL-fragment blocklists, benchmark answer strings.
  *
  * Scale shape: a pure scan projection — the automaton rides to tasks
  * as a reference object (built once from the dictionary), the
  * per-pattern count explode is |patterns|-bounded per doc and filters
  * to matches before anything downstream; the corpus never shuffles.
  */
object MultiMatch {

  /** Fixture dictionary: mid-frequency corpus phrases, including a
    * nested pair ("table" ⊂ "table table") so the fail-chain output
    * path (a longer match's interior completing a shorter pattern) is
    * exercised on every doc that hits it.
    */
  val Terms: Seq[String] = Seq(
    "table", "table table", "fast table", "scan scan",
    "merge batch part", "vector")

  /** Per-doc match counts over a caller frame: one `(id, term, n)` row
    * per dictionary phrase with ≥1 occurrence.
    */
  def matches(docs: DataFrame, idCol: String, textCol: String,
    terms: Seq[String] = Terms): DataFrame = {
    val termArr = array(terms.map(lit): _*)
    docs
      .select(col(idCol), AhoCorasick(col(textCol), terms).as("cnts"))
      .select(col(idCol), posexplode(col("cnts")).as(Seq("pos", "n")))
      .filter(col("n") > 0)
      .select(col(idCol), element_at(termArr, col("pos") + 1).as("term"),
        col("n"))
  }

  /** q_multimatch — [[matches]] over the documents corpus. */
  def multiMatch(s: SparkSession, d: String): DataFrame =
    matches(Tables.documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id"), col("term"))

  val multiMatchSql: String = {
    val vals = Terms.map(t => s"('$t')").mkString(", ")
    s"""WITH pats AS (SELECT * FROM (VALUES $vals) p(term)),
       |hits AS (
       |  SELECT d.doc_id, p.term,
       |         len([i for i in range(1, len(d.text) - len(p.term) + 2)
       |              if substr(d.text, i, len(p.term)) = p.term])::BIGINT AS n
       |  FROM documents d CROSS JOIN pats p
       |)
       |SELECT doc_id, term, n FROM hits WHERE n > 0
       |ORDER BY doc_id, term""".stripMargin
  }
}
