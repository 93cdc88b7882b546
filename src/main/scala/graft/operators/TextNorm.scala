package graft.operators

import graft.Tables
import graft.functions.NfcNormalize
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unicode hygiene for multilingual corpora: NFC normalization and
  * per-document script profiling. Real crawl data arrives with mixed
  * composition forms (é as one codepoint vs e + combining acute) —
  * unnormalized, the SAME text hashes differently, so exact dedup
  * under-merges, shingle sets diverge, and tokenizers learn duplicate
  * entries. NFC first is the standard contract (it's what both
  * Python's `unicodedata` pipelines and DuckDB's `nfc_normalize`
  * produce), and it must run BEFORE any hash/shingle stage — the
  * ordering cousin of [[Scrub]]'s scrub-before-dedup theorem.
  *
  * Both queries are per-row scan projections (native codegen'd
  * [[graft.functions.NfcNormalizeExpr]] with an ASCII fast path /
  * codegen'd regexp counts) — no shuffle, no UDF; at 100 TB they
  * pipeline into whatever consumes them.
  *
  * The test corpus is pure-ASCII word soup, so both queries inject
  * deterministic non-ASCII material derived from doc_id (mirrored
  * verbatim in the oracles) — same pattern as the PII injections.
  */
object TextNorm {

  /** NFC report over any `(doc_id, text)` frame: changed flag, char
    * lengths before/after, md5 of the normalized text (the hash
    * downstream exact-dedup would key on).
    */
  def nfcReport(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("text"),
        NfcNormalize.nfc(col("text")).as("norm"))
      .select(col("doc_id"),
        (col("text") =!= col("norm")).as("changed"),
        length(col("text")).cast("long").as("len_before"),
        length(col("norm")).cast("long").as("len_after"),
        md5(col("norm")).as("norm_hash"))

  /** Decomposed-form suffix injected into every 5th doc: `cafe` +
    * combining acute, `nai` + combining diaeresis + `ve` — NFC
    * composes both to single codepoints (café, naïve).
    */
  private val DecomposedSuffix = " cafe\u0301 nai\u0308ve"

  /** q_normalize_text — [[nfcReport]] with decomposed-form injection
    * on every 5th doc.
    */
  def normalizeText(s: SparkSession, d: String): DataFrame = {
    val injected = Tables.documents(s, d).select(col("doc_id"),
      when(col("doc_id") % 5 === 0, concat(col("text"), lit(DecomposedSuffix)))
        .otherwise(col("text")).as("text"))
    nfcReport(injected).orderBy(col("doc_id"))
  }

  val normalizeTextSql: String =
    s"""WITH injected AS (
       |  SELECT doc_id,
       |         CASE WHEN doc_id % 5 = 0
       |              THEN text || ' cafe' || chr(769) || ' nai' || chr(776) || 've'
       |              ELSE text END AS text
       |  FROM documents
       |)
       |SELECT doc_id,
       |       (text <> nfc_normalize(text)) AS changed,
       |       length(text)::BIGINT AS len_before,
       |       length(nfc_normalize(text))::BIGINT AS len_after,
       |       md5(nfc_normalize(text)) AS norm_hash
       |FROM injected
       |ORDER BY doc_id""".stripMargin

  /** Script ranges as literal codepoint ranges — identical char-class
    * semantics in Java regex and RE2 (no named properties, which the
    * two engines define differently).
    */
  val LatinRe = "[A-Za-z]"
  val CyrillicRe = "[а-яА-ЯёЁ]"
  val GreekRe = "[α-ωΑ-Ω]"
  val CjkRe = "[一-鿿]"
  val DigitRe = "[0-9]"

  /** Per-doc script profile over any `(doc_id, text)` frame: counts
    * per script class + the dominant script (fixed precedence on
    * ties: latin, cyrillic, greek, cjk, digit — deterministic on both
    * engines).
    */
  def scriptProfile(docs: DataFrame): DataFrame = {
    val t = col("text")
    val counted = docs.select(col("doc_id"),
      regexp_count(t, lit(LatinRe)).cast("long").as("n_latin"),
      regexp_count(t, lit(CyrillicRe)).cast("long").as("n_cyrillic"),
      regexp_count(t, lit(GreekRe)).cast("long").as("n_greek"),
      regexp_count(t, lit(CjkRe)).cast("long").as("n_cjk"),
      regexp_count(t, lit(DigitRe)).cast("long").as("n_digit"))
    val top = greatest(col("n_latin"), col("n_cyrillic"), col("n_greek"),
      col("n_cjk"), col("n_digit"))
    counted.withColumn("main_script",
      when(col("n_latin") === top, "latin")
        .when(col("n_cyrillic") === top, "cyrillic")
        .when(col("n_greek") === top, "greek")
        .when(col("n_cjk") === top, "cjk")
        .otherwise("digit"))
  }

  /** q_script_mix — [[scriptProfile]] with deterministic non-Latin
    * injection: every 4k+1 doc gains Cyrillic, 4k+2 CJK, 4k+3 Greek.
    */
  def scriptMix(s: SparkSession, d: String): DataFrame = {
    val injected = Tables.documents(s, d).select(col("doc_id"),
      when(col("doc_id") % 4 === 1,
        concat(col("text"), lit(" привет мир")))
        .when(col("doc_id") % 4 === 2,
          concat(col("text"), lit(" 你好世界")))
        .when(col("doc_id") % 4 === 3,
          concat(col("text"), lit(" γειά σου")))
        .otherwise(col("text")).as("text"))
    scriptProfile(injected).orderBy(col("doc_id"))
  }

  val scriptMixSql: String =
    s"""WITH injected AS (
       |  SELECT doc_id,
       |         CASE WHEN doc_id % 4 = 1 THEN text || ' привет мир'
       |              WHEN doc_id % 4 = 2 THEN text || ' 你好世界'
       |              WHEN doc_id % 4 = 3 THEN text || ' γειά σου'
       |              ELSE text END AS text
       |  FROM documents
       |), counted AS (
       |  SELECT doc_id,
       |         len(regexp_extract_all(text, '$LatinRe'))::BIGINT AS n_latin,
       |         len(regexp_extract_all(text, '$CyrillicRe'))::BIGINT AS n_cyrillic,
       |         len(regexp_extract_all(text, '$GreekRe'))::BIGINT AS n_greek,
       |         len(regexp_extract_all(text, '$CjkRe'))::BIGINT AS n_cjk,
       |         len(regexp_extract_all(text, '$DigitRe'))::BIGINT AS n_digit
       |  FROM injected
       |)
       |SELECT *,
       |       CASE WHEN n_latin = greatest(n_latin, n_cyrillic, n_greek, n_cjk, n_digit) THEN 'latin'
       |            WHEN n_cyrillic = greatest(n_latin, n_cyrillic, n_greek, n_cjk, n_digit) THEN 'cyrillic'
       |            WHEN n_greek = greatest(n_latin, n_cyrillic, n_greek, n_cjk, n_digit) THEN 'greek'
       |            WHEN n_cjk = greatest(n_latin, n_cyrillic, n_greek, n_cjk, n_digit) THEN 'cjk'
       |            ELSE 'digit' END AS main_script
       |FROM counted
       |ORDER BY doc_id""".stripMargin
}
