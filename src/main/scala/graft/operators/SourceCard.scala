package graft.operators

import graft.Tables
import graft.functions.TextSim
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-source dataset card — the "Datasheets for Datasets" census
  * (Gebru et al. 2018) as one hash-checked query: for every source,
  * the numbers a curation review reads FIRST — volume (docs, chars,
  * tokens), redundancy (exact-dup share, type-token vocabulary),
  * shape (mean doc length), cleanliness (alphabetic character share),
  * and language mix (distinct langs + the majority language by the
  * house struct-argmax). The capstone that composes the corpus
  * family's primitives into the artifact a data card actually ships —
  * each column is individually boring, the per-source ROW is what
  * gets a corpus admitted to a training mix.
  *
  * Scale: three corpus folds, all keyed on source and map-side
  * partial-aggregated — (1) the scalar moments (counts/chars/tokens/
  * dup hashes: the distinct-md5 term is the one two-phase fold, keyed
  * (source, hash)), (2) the vocabulary fold keyed (source, token),
  * (3) the language fold keyed (source, lang) — then ≤|sources|-row
  * joins. Ratios on the micro lattice, one division each.
  */
object SourceCard {

  def sourceCard(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val scalars = docs.groupBy(col("source"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(length(col("text"))).cast("long").as("n_chars"),
        sum(size(TextSim.tokens(col("text")))).cast("long").as("ws_tokens"),
        countDistinct(md5(col("text"))).cast("long").as("n_distinct_docs"),
        sum(length(regexp_replace(col("text"), "[a-z ]", "")))
          .cast("long").as("n_nonalpha"))
    val vocab = docs
      .select(col("source"), explode(TextSim.tokens(col("text"))).as("w"))
      .groupBy(col("source"))
      .agg(countDistinct(col("w")).cast("long").as("vocab"))
    val langs = docs.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).cast("long").as("n"))
      .groupBy(col("source"))
      .agg(count(lit(1)).cast("long").as("n_langs"),
        // majority language: the house argmax (count, then the
        // LEXICOGRAPHICALLY LARGEST lang on ties — max over a struct)
        max(struct(col("n"), col("lang"))).getField("lang").as("top_lang"))
    scalars.join(vocab, Seq("source")).join(langs, Seq("source"))
      .select(col("source"), col("n_docs"), col("n_chars"),
        col("ws_tokens"), col("vocab"), col("n_langs"), col("top_lang"),
        (col("n_docs") - col("n_distinct_docs")).as("dup_docs"),
        expr("((n_docs - n_distinct_docs) * 1000000) div n_docs")
          .as("dup_share_micro"),
        expr("(ws_tokens * 1000000) div n_docs").as("tokens_per_doc_micro"),
        expr("((n_chars - n_nonalpha) * 1000000) div n_chars")
          .as("alpha_share_micro"))
      .orderBy(col("source"))
  }

  val sourceCardSql: String =
    s"""WITH scalars AS (
       |  SELECT source, count(*)::BIGINT AS n_docs,
       |         sum(len(text))::BIGINT AS n_chars,
       |         sum(len(list_filter(string_split(text, ' '), x -> x <> '')))::BIGINT
       |           AS ws_tokens,
       |         count(DISTINCT md5(text))::BIGINT AS n_distinct_docs,
       |         sum(len(regexp_replace(text, '[a-z ]', '', 'g')))::BIGINT
       |           AS n_nonalpha
       |  FROM documents GROUP BY source
       |), vocab AS (
       |  SELECT source, count(DISTINCT w)::BIGINT AS vocab FROM (
       |    SELECT source,
       |           unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
       |    FROM documents)
       |  GROUP BY source
       |), langs AS (
       |  SELECT source, count(*)::BIGINT AS n_langs,
       |         max({'n': n, 'lang': lang}).lang AS top_lang
       |  FROM (SELECT source, lang, count(*)::BIGINT AS n
       |        FROM documents GROUP BY source, lang)
       |  GROUP BY source
       |)
       |SELECT s.source, s.n_docs, s.n_chars, s.ws_tokens, v.vocab,
       |       l.n_langs, l.top_lang,
       |       (s.n_docs - s.n_distinct_docs)::BIGINT AS dup_docs,
       |       ((s.n_docs - s.n_distinct_docs) * 1000000) // s.n_docs
       |         AS dup_share_micro,
       |       (s.ws_tokens * 1000000) // s.n_docs AS tokens_per_doc_micro,
       |       ((s.n_chars - s.n_nonalpha) * 1000000) // s.n_chars
       |         AS alpha_share_micro
       |FROM scalars s
       |JOIN vocab v ON v.source = s.source
       |JOIN langs l ON l.source = s.source
       |ORDER BY s.source""".stripMargin
}
