package graft.operators

import graft.Tables
import graft.functions.TextSim
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readability scoring — the classic Flesch Reading Ease and
  * Automated Readability Index formulas as corpus quality signals
  * (readability bands are a standard training-data mix dimension:
  * textbook-grade vs forum-grade English select differently for
  * different model stages).
  *
  * The corpus fixture has no sentence punctuation, so sentence count
  * uses a deterministic pseudo-sentence rule — ceil(words /
  * [[SentTokens]]) — and syllables use the standard vowel-run
  * approximation (`[aeiouy]+` match count). Both are stated knobs,
  * not hidden guesses: on punctuated corpora swap the sentence rule
  * for a `[.!?]+` match count, same plan.
  *
  * Scale: a pure per-row projection (regex counts + arithmetic, no
  * UDF, no shuffle) — pipelines into the scan like
  * [[TextAnalysis.quality]]; the per-source rollup below is one
  * partial-agg groupBy on a low-cardinality key.
  */
object Readability {

  /** Pseudo-sentence length (tokens) for unpunctuated corpora. */
  val SentTokens = 15

  /** Per-doc readability over any `(doc_id, text)` frame: word /
    * syllable / pseudo-sentence counts, Flesch Reading Ease
    * (206.835 − 1.015·W/S − 84.6·Y/W), ARI (4.71·C/W + 0.5·W/S −
    * 21.43, C = non-space chars), and the FRE band.
    */
  def readability(docs: DataFrame, keep: Seq[String] = Nil): DataFrame = {
    val withCounts = docs
      .select(Seq(col("doc_id")) ++ keep.map(col) ++ Seq(
        size(TextSim.tokens(col("text"))).cast("long").as("n_words"),
        regexp_count(lower(col("text")), lit("[aeiouy]+")).cast("long")
          .as("n_syll"),
        length(regexp_replace(col("text"), " ", "")).cast("long")
          .as("n_chars_ns")): _*)
      .filter(col("n_words") >= 1)
      .withColumn("n_sents", expr(s"(n_words + ${SentTokens - 1}) div $SentTokens"))
    val w = col("n_words").cast("double")
    val fre = lit(206.835) -
      lit(1.015) * (w / col("n_sents").cast("double")) -
      lit(84.6) * (col("n_syll").cast("double") / w)
    val ari = lit(4.71) * (col("n_chars_ns").cast("double") / w) +
      lit(0.5) * (w / col("n_sents").cast("double")) - lit(21.43)
    withCounts.select(Seq(col("doc_id")) ++ keep.map(col) ++ Seq(
      col("n_words"), col("n_syll"), col("n_sents"),
      TextSim.r6(fre).as("fre"), TextSim.r6(ari).as("ari"),
      when(TextSim.r6(fre) >= 70.0, "easy")
        .when(TextSim.r6(fre) >= 50.0, "standard")
        .when(TextSim.r6(fre) >= 30.0, "difficult")
        .otherwise("hard").as("band")): _*)
  }

  /** q_readability — [[readability]] over `documents`. */
  def readabilityQuery(s: SparkSession, d: String): DataFrame =
    readability(Tables.documents(s, d)).orderBy(col("doc_id"))

  /** q_readability_domain — the per-source rollup (the mix dimension):
    * doc counts, exact mean FRE (decimal sum of the already-r6-rounded
    * per-doc scores — order-independent where a double fold is not),
    * and the share of docs below the 'difficult' line. One partial-agg
    * groupBy on the low-cardinality source key.
    */
  def readabilityDomain(s: SparkSession, d: String): DataFrame =
    readability(Tables.documents(s, d), keep = Seq("source"))
      .groupBy(col("source"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        TextSim.r6(TextSim.dsum(col("fre")) / count(lit(1))).as("mean_fre"),
        sum(when(col("fre") < 50.0, 1L).otherwise(0L)).cast("long")
          .as("n_below_std"))
      .orderBy(col("source"))

  val readabilityDomainSql: String = {
    val w = "n_words::DOUBLE"
    val freE = s"206.835 - 1.015 * ($w / n_sents::DOUBLE) - 84.6 * (n_syll::DOUBLE / $w)"
    val freR = TextSim.r6Sql(freE)
    s"""WITH counts AS (
       |  SELECT doc_id, source,
       |         len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT AS n_words,
       |         len(regexp_extract_all(lower(text), '[aeiouy]+'))::BIGINT AS n_syll
       |  FROM documents
       |), sents AS (
       |  SELECT *, (n_words + ${SentTokens - 1}) // $SentTokens AS n_sents
       |  FROM counts WHERE n_words >= 1
       |), scored AS (
       |  SELECT source, $freR AS fre FROM sents
       |)
       |SELECT source, count(*)::BIGINT AS n_docs,
       |       ${TextSim.r6Sql(s"${TextSim.dsumSql("fre")} / count(*)")} AS mean_fre,
       |       sum(CASE WHEN fre < 50.0 THEN 1 ELSE 0 END)::BIGINT AS n_below_std
       |FROM scored
       |GROUP BY source
       |ORDER BY source""".stripMargin
  }

  val readabilitySql: String = {
    val w = "n_words::DOUBLE"
    val freE = s"206.835 - 1.015 * ($w / n_sents::DOUBLE) - 84.6 * (n_syll::DOUBLE / $w)"
    val ariE = s"4.71 * (n_chars_ns::DOUBLE / $w) + 0.5 * ($w / n_sents::DOUBLE) - 21.43"
    val freR = TextSim.r6Sql(freE)
    s"""WITH counts AS (
       |  SELECT doc_id,
       |         len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT AS n_words,
       |         len(regexp_extract_all(lower(text), '[aeiouy]+'))::BIGINT AS n_syll,
       |         length(replace(text, ' ', ''))::BIGINT AS n_chars_ns
       |  FROM documents
       |), sents AS (
       |  SELECT *, (n_words + ${SentTokens - 1}) // $SentTokens AS n_sents
       |  FROM counts WHERE n_words >= 1
       |)
       |SELECT doc_id, n_words, n_syll, n_sents,
       |       $freR AS fre,
       |       ${TextSim.r6Sql(ariE)} AS ari,
       |       CASE WHEN $freR >= 70.0 THEN 'easy'
       |            WHEN $freR >= 50.0 THEN 'standard'
       |            WHEN $freR >= 30.0 THEN 'difficult'
       |            ELSE 'hard' END AS band
       |FROM sents
       |ORDER BY doc_id""".stripMargin
  }
}
