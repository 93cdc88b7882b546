package graft.operators

import graft.Tables
import graft.functions.TextSim
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text analysis over the `documents` corpus: language ID, quality
  * scoring, token counting, winnowing fingerprints.
  *
  * All four are pure per-row maps (higher-order-function expressions,
  * no UDF, no shuffle) — at 100 TB they scale linearly with the scan
  * and pipeline into whatever shuffle follows. Every arithmetic step is
  * mirrored exactly in the DuckDB oracle (explicit casts + round-6).
  *
  * Reference: the GPT extraction stage is the reference's only "text
  * understanding" step (Notion_openai_vector_etl.py:254-301); these
  * operators are the corpus-curation layer a training-data pipeline
  * adds on top.
  */
object TextAnalysis {

  /** Stopword profiles for the language-ID scorer. */
  val Profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("a", "the", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "un", "est", "que"),
    "es" -> Seq("el", "los", "las", "y", "una", "es", "por"),
  )

  private def hits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(array(words.map(lit): _*), t)))
      .cast("long")

  private[operators] def hitsSql(t: String, words: Seq[String]): String =
    s"len(list_filter($t, x -> list_contains([${words.map(w => s"'$w'").mkString(", ")}], x)))"

  /** q_lang_id — stopword-profile language ID: per-language hit counts,
    * argmax with fixed precedence, hit-ratio confidence.
    */
  def langId(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), TextSim.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 1)
    val scored = toks.select(
      Seq(col("doc_id"), size(col("t")).cast("long").as("tok_count")) ++
        Profiles.map { case (l, ws) => hits(col("t"), ws).as(s"${l}_hits") }: _*)
    scored.select(col("doc_id"), col("tok_count"),
      col("en_hits"), col("de_hits"), col("fr_hits"), col("es_hits"),
      when(greatest(col("en_hits"), col("de_hits"), col("fr_hits"), col("es_hits")) === 0, "unknown")
        .when(col("en_hits") >= col("de_hits") && col("en_hits") >= col("fr_hits") &&
          col("en_hits") >= col("es_hits"), "en")
        .when(col("de_hits") >= col("fr_hits") && col("de_hits") >= col("es_hits"), "de")
        .when(col("fr_hits") >= col("es_hits"), "fr")
        .otherwise("es").as("pred_lang"),
      TextSim.r6(col("en_hits").cast("double") / col("tok_count")).as("en_ratio"))
      .orderBy(col("doc_id"))
  }

  /** The lang-ID scored-frame CTEs + final SELECT body, WITHOUT the
    * presentation sort — shared verbatim by langIdSql and the
    * [[Kappa]] oracle (one definition of the prediction, the
    * nbClassifySql sharing discipline).
    */
  val langPredSql: String = {
    val h = Profiles.map { case (l, ws) => s"${hitsSql("t", ws)} AS ${l}_hits" }
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
       |  FROM documents
       |), scored AS (
       |  SELECT doc_id, len(t)::BIGINT AS tok_count, ${h.mkString(",\n         ")}
       |  FROM toks WHERE len(t) >= 1
       |)
       |SELECT doc_id, tok_count, en_hits, de_hits, fr_hits, es_hits,
       |       CASE WHEN greatest(en_hits, de_hits, fr_hits, es_hits) = 0 THEN 'unknown'
       |            WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits >= es_hits THEN 'en'
       |            WHEN de_hits >= fr_hits AND de_hits >= es_hits THEN 'de'
       |            WHEN fr_hits >= es_hits THEN 'fr'
       |            ELSE 'es' END AS pred_lang,
       |       ${TextSim.r6Sql("en_hits::DOUBLE / tok_count")} AS en_ratio
       |FROM scored""".stripMargin
  }

  val langIdSql: String = s"$langPredSql\nORDER BY doc_id"

  /** q_quality — heuristic quality score: token count, mean word
    * length, punctuation ratio, stopword ratio, bounded composite.
    */
  def quality(s: SparkSession, d: String): DataFrame =
    qualityScores(s, d).orderBy(col("doc_id"))

  /** The q_quality projection without its presentation sort — for
    * consumers (e.g. [[Corpus.sampleWeighted]]) that keep composing.
    */
  def qualityScores(s: SparkSession, d: String): DataFrame =
    qualityScoresOf(Tables.documents(s, d))

  /** [[qualityScores]] over ANY `(doc_id, text)` frame — the composite
    * score as a reusable signal (e.g. [[Dedup.keepBest]] ranks dup-
    * cluster members with it over the augmented corpus).
    */
  def qualityScoresOf(docs: DataFrame): DataFrame = {
    val en = Profiles.head._2
    val base = docs
      .select(col("doc_id"), col("text"), TextSim.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 1)
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        size(col("t")).cast("long").as("tok_count"),
        aggregate(col("t"), lit(0L), (a, w) => a + length(w)).as("wlen_sum"),
        hits(col("t"), en).as("stop_hits"),
        (length(col("text")) -
          length(regexp_replace(col("text"), "[.,!?;:]", ""))).cast("long").as("punct"))
    base.select(col("doc_id"), col("n_chars"), col("tok_count"),
      TextSim.r6(col("wlen_sum").cast("double") / col("tok_count")).as("mean_wlen"),
      TextSim.r6(col("punct").cast("double") / col("n_chars")).as("punct_ratio"),
      TextSim.r6(col("stop_hits").cast("double") / col("tok_count")).as("stop_ratio"),
      TextSim.r6(
        lit(0.3) * least(col("tok_count").cast("double") / 50.0, lit(1.0)) +
          lit(0.3) * (lit(1.0) - col("punct").cast("double") / col("n_chars")) +
          lit(0.2) * (col("stop_hits").cast("double") / col("tok_count")) +
          lit(0.2) * least(col("wlen_sum").cast("double") / col("tok_count") / 8.0, lit(1.0))
      ).as("quality"))
  }

  // expressed through qualityScoreCtesSql so the 4-term composite has
  // exactly ONE SQL definition — a tweak can't desynchronize q_quality
  // from the oracles that rank by the same score
  /** q_quality_norm — per-domain QUANTILE NORMALIZATION of the quality
    * composite: each document's percentile among its own domain's
    * scores (rank−1 / n−1, micro-fixed). The calibration step between
    * scoring and mixing: a single raw threshold across domains selects
    * whatever the scorer structurally favors (long, punctuated prose —
    * so high-resource domains sweep the budget), while the
    * within-domain percentile equalizes selection RATES — "keep each
    * domain's best 30%" becomes one comparable column
    * (`q_filter_domain` adapts the threshold per domain; this emits
    * the calibrated per-doc score its samplers consume). Determinism:
    * rank over the r6-fixed quality with doc_id tiebreak (total
    * order), integer micro division, single-doc domain → 0. Scale:
    * per-DOMAIN windows (parallel across domains; salt a mega-domain
    * by the [[Kmv]] rank-sketch path if one domain dwarfs the rest);
    * one quality scan + one source-projection scan.
    */
  def qualityNorm(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = qualityScores(s, d).select(col("doc_id"), col("quality"))
    val src = Tables.documents(s, d).select(col("doc_id"), col("source"))
    val w = Window.partitionBy(col("source"))
    scored.join(src, Seq("doc_id"))
      .withColumn("dom_rank",
        row_number().over(w.orderBy(col("quality"), col("doc_id"))))
      .withColumn("n_dom", count(lit(1)).over(w))
      .select(col("doc_id"), col("source"), col("quality"),
        col("dom_rank").cast("long").as("dom_rank"),
        when(col("n_dom") > 1,
          // bigint BEFORE the scale-up: row_number() is Int, and
          // 1e6·(rank−1) wraps 32 bits past ~2 147 docs per domain —
          // found by the r11 sf1 gate (2 500-doc domains at 10×)
          expr("(1000000 * cast(dom_rank - 1 as bigint)) div (n_dom - 1)"))
          .otherwise(0L).as("pct_micro"))
      .orderBy(col("doc_id"))
  }

  val qualityNormSql: String =
    s"""WITH ${qualityScoreCtesSql("documents")},
       |ranked AS (
       |  SELECT s.doc_id, d.source, s.quality,
       |         row_number() OVER (PARTITION BY d.source
       |                            ORDER BY s.quality, s.doc_id) AS dom_rank,
       |         count(*) OVER (PARTITION BY d.source) AS n_dom
       |  FROM q_scores s
       |  JOIN (SELECT doc_id, source FROM documents) d USING (doc_id)
       |)
       |SELECT doc_id, source, quality, dom_rank::BIGINT AS dom_rank,
       |       CASE WHEN n_dom > 1
       |            THEN (1000000 * (dom_rank - 1)) // (n_dom - 1)
       |            ELSE 0 END::BIGINT AS pct_micro
       |FROM ranked
       |ORDER BY doc_id""".stripMargin

  val qualitySql: String =
    s"""WITH ${qualityScoreCtesSql("documents")}
       |SELECT b.doc_id, b.n_chars, b.tok_count,
       |       ${TextSim.r6Sql("b.wlen_sum::DOUBLE / b.tok_count")} AS mean_wlen,
       |       ${TextSim.r6Sql("b.punct::DOUBLE / b.n_chars")} AS punct_ratio,
       |       ${TextSim.r6Sql("b.stop_hits::DOUBLE / b.tok_count")} AS stop_ratio,
       |       s.quality
       |FROM q_base b JOIN q_scores s ON s.doc_id = b.doc_id
       |ORDER BY b.doc_id""".stripMargin

  /** SQL mirror of [[qualityScoresOf]] as a reusable CTE pair
    * `q_base`/`q_scores(doc_id, quality)` over any relation
    * `rel(doc_id, text)` — the composable form of [[qualitySql]]'s
    * score column for oracle queries that rank by quality.
    */
  def qualityScoreCtesSql(rel: String): String = {
    val stop = hitsSql("t", Profiles.head._2)
    s"""q_base AS (
       |  SELECT doc_id, len(text)::BIGINT AS n_chars,
       |         len(t)::BIGINT AS tok_count,
       |         list_sum(list_transform(t, w -> len(w)))::BIGINT AS wlen_sum,
       |         $stop::BIGINT AS stop_hits,
       |         (len(text) - len(regexp_replace(text, '[.,!?;:]', '', 'g')))::BIGINT AS punct
       |  FROM (SELECT doc_id, text,
       |               list_filter(string_split(text, ' '), x -> x <> '') AS t
       |        FROM $rel)
       |  WHERE len(t) >= 1
       |), q_scores AS (
       |  SELECT doc_id,
       |         ${TextSim.r6Sql(
      """0.3 * least(tok_count::DOUBLE / 50.0, 1.0)
        |           + 0.3 * (1.0 - punct::DOUBLE / n_chars)
        |           + 0.2 * (stop_hits::DOUBLE / tok_count)
        |           + 0.2 * least(wlen_sum::DOUBLE / tok_count / 8.0, 1.0)""".stripMargin)} AS quality
       |  FROM q_base
       |)""".stripMargin
  }

  /** q_repetition — duplicate word-3-gram fraction (the Gopher-rule
    * style repetition signal: boilerplate and templated text repeat
    * n-grams; quality prose doesn't). Per-row map, no shuffle.
    */
  def repetition(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), TextSim.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"),
        (size(col("t")) - 2).cast("long").as("n_grams"),
        size(TextSim.shingles3(col("t"))).cast("long").as("n_distinct"))
      .withColumn("dup_fraction",
        TextSim.r6((col("n_grams") - col("n_distinct")).cast("double") / col("n_grams")))
      .orderBy(col("doc_id"))

  val repetitionSql: String =
    s"""SELECT doc_id, (len(t) - 2)::BIGINT AS n_grams,
       |       len(${TextSim.shingles3Sql("t")})::BIGINT AS n_distinct,
       |       ${TextSim.r6Sql(s"((len(t) - 2) - len(${TextSim.shingles3Sql("t")}))::DOUBLE / (len(t) - 2)")} AS dup_fraction
       |FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
       |      FROM documents)
       |WHERE len(t) >= 3
       |ORDER BY doc_id""".stripMargin

  /** q_filter — the composite keep/drop decision every curation
    * pipeline ends with: quality composite ≥ 0.5 AND predicted English
    * AND duplicate-3-gram fraction ≤ 0.2. Computed as ONE per-row
    * projection over the scan (the signals share the token array) —
    * never as joins of the individual signal queries, which would pay
    * two id-shuffles for what is a fused map. Docs under 3 tokens have
    * no 3-gram identity and are dropped by the frame's contract.
    */
  def filterMask(s: SparkSession, d: String): DataFrame =
    filterSignals(Tables.documents(s, d)).orderBy(col("doc_id"))

  /** The fused filter over any `(doc_id, text)` frame — batch OR
    * streaming: it's a pure projection (no sort, no state), so the same
    * plan curates a live document feed unchanged (asserted in
    * StreamingSpec). [[filterMask]] adds the total order the oracle
    * compare needs. `passthrough` columns ride the projection
    * unchanged (e.g. `source` for [[qualityDomain]]) — carrying them
    * through the map is free; re-attaching them later would cost an
    * id-shuffle join.
    */
  def filterSignals(docs: DataFrame,
    passthrough: Seq[String] = Nil): DataFrame = {
    val en = Profiles.head._2
    val pt = passthrough.map(col)
    val base = docs
      .select(col("doc_id") +: pt :+ col("text") :+
        TextSim.tokens(col("text")).as("t"): _*)
      .filter(size(col("t")) >= 3)
      .select(col("doc_id") +: pt ++: Seq(
        length(col("text")).cast("long").as("n_chars"),
        size(col("t")).cast("long").as("tok_count"),
        aggregate(col("t"), lit(0L), (a, w) => a + length(w)).as("wlen_sum"),
        (length(col("text")) -
          length(regexp_replace(col("text"), "[.,!?;:]", ""))).cast("long").as("punct"),
        hits(col("t"), en).as("en_hits"),
        hits(col("t"), Profiles(1)._2).as("de_hits"),
        hits(col("t"), Profiles(2)._2).as("fr_hits"),
        hits(col("t"), Profiles(3)._2).as("es_hits"),
        (size(col("t")) - 2).cast("long").as("n_grams"),
        size(TextSim.shingles3(col("t"))).cast("long").as("n_distinct")): _*)
    val quality = TextSim.r6(
      lit(0.3) * least(col("tok_count").cast("double") / 50.0, lit(1.0)) +
        lit(0.3) * (lit(1.0) - col("punct").cast("double") / col("n_chars")) +
        lit(0.2) * (col("en_hits").cast("double") / col("tok_count")) +
        lit(0.2) * least(col("wlen_sum").cast("double") / col("tok_count") / 8.0, lit(1.0)))
    val isEn = greatest(col("en_hits"), col("de_hits"), col("fr_hits"), col("es_hits")) > 0 &&
      col("en_hits") >= col("de_hits") && col("en_hits") >= col("fr_hits") &&
      col("en_hits") >= col("es_hits")
    val dupFrac = TextSim.r6(
      (col("n_grams") - col("n_distinct")).cast("double") / col("n_grams"))
    base.select(col("doc_id") +: pt ++: Seq(quality.as("quality"),
      isEn.as("is_en"), dupFrac.as("dup_fraction")): _*)
      .withColumn("keep",
        col("quality") >= 0.5 && col("is_en") && col("dup_fraction") <= 0.2)
  }

  val filterMaskSql: String = {
    s"""WITH ${signalsSqlCte("")}
       |SELECT doc_id, quality, is_en, dup_fraction,
       |       (quality >= 0.5 AND is_en AND dup_fraction <= 0.2) AS keep
       |FROM scored
       |ORDER BY doc_id""".stripMargin
  }

  /** q_quality_curve — the filter calibration curve: quality-score
    * deciles vs the global filter's keep rate (plus exact mean quality
    * per decile). The picture a threshold review reads — is the 0.5
    * cutoff sitting on a cliff or a plateau, how much mass the next
    * notch would cost — where `q_quality_domain` answers per-source
    * placement. One fused signals projection into one ≤10-group
    * partial agg; the decile key is floor(10·q) on the ALREADY
    * r6-rounded score, so bucket membership is engine-identical.
    */
  def qualityCurve(s: SparkSession, d: String): DataFrame =
    filterSignals(Tables.documents(s, d))
      .withColumn("decile",
        least(floor(col("quality") * 10).cast("long"), lit(9L)))
      .groupBy(col("decile"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).cast("long").as("n_keep"),
        TextSim.r6(sum(when(col("keep"), 1).otherwise(0)).cast("double") /
          count(lit(1)).cast("double")).as("keep_rate"),
        TextSim.r6(TextSim.dsum(col("quality")) /
          count(lit(1)).cast("double")).as("mean_quality"))
      .orderBy(col("decile"))

  val qualityCurveSql: String = {
    s"""WITH ${signalsSqlCte("")}
       |SELECT least(floor(quality * 10), 9)::BIGINT AS decile,
       |       count(*)::BIGINT AS n_docs,
       |       sum(CASE WHEN quality >= 0.5 AND is_en AND dup_fraction <= 0.2
       |                THEN 1 ELSE 0 END)::BIGINT AS n_keep,
       |       ${TextSim.r6Sql(
      "sum(CASE WHEN quality >= 0.5 AND is_en AND dup_fraction <= 0.2 THEN 1 ELSE 0 END)::DOUBLE / count(*)::DOUBLE")} AS keep_rate,
       |       ${TextSim.r6Sql(s"${TextSim.dsumSql("quality")} / count(*)::DOUBLE")} AS mean_quality
       |FROM scored
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** base + scored CTEs of the fused filter; `pt` is an optional
    * ", col"-style passthrough fragment carried through both CTEs
    * (the SQL mirror of [[filterSignals]]'s `passthrough`).
    */
  /** [[signalsSqlCte]] for sibling operators' oracle SQL. */
  private[operators] def signalsSqlCteFor(pt: String,
    from: String = "documents"): String =
    signalsSqlCte(pt, from)

  private def signalsSqlCte(pt: String, from: String = "documents"): String = {
    val en = hitsSql("t", Profiles.head._2)
    val de = hitsSql("t", Profiles(1)._2)
    val fr = hitsSql("t", Profiles(2)._2)
    val es = hitsSql("t", Profiles(3)._2)
    s"""base AS (
       |  SELECT doc_id$pt, len(text)::BIGINT AS n_chars,
       |         len(t)::BIGINT AS tok_count,
       |         list_sum(list_transform(t, w -> len(w)))::BIGINT AS wlen_sum,
       |         (len(text) - len(regexp_replace(text, '[.,!?;:]', '', 'g')))::BIGINT AS punct,
       |         $en::BIGINT AS en_hits, $de::BIGINT AS de_hits,
       |         $fr::BIGINT AS fr_hits, $es::BIGINT AS es_hits,
       |         (len(t) - 2)::BIGINT AS n_grams,
       |         len(${TextSim.shingles3Sql("t")})::BIGINT AS n_distinct
       |  FROM (SELECT doc_id$pt, text,
       |               list_filter(string_split(text, ' '), x -> x <> '') AS t
       |        FROM $from)
       |  WHERE len(t) >= 3
       |), scored AS (
       |  SELECT doc_id$pt,
       |         ${TextSim.r6Sql(
            """0.3 * least(tok_count::DOUBLE / 50.0, 1.0)
              |           + 0.3 * (1.0 - punct::DOUBLE / n_chars)
              |           + 0.2 * (en_hits::DOUBLE / tok_count)
              |           + 0.2 * least(wlen_sum::DOUBLE / tok_count / 8.0, 1.0)""".stripMargin)} AS quality,
       |         (greatest(en_hits, de_hits, fr_hits, es_hits) > 0
       |          AND en_hits >= de_hits AND en_hits >= fr_hits
       |          AND en_hits >= es_hits) AS is_en,
       |         ${TextSim.r6Sql("(n_grams - n_distinct)::DOUBLE / n_grams")} AS dup_fraction
       |  FROM base
       |)""".stripMargin
  }

  /** q_quality_domain — per-source quality calibration: exact p50/p90
    * of the quality score (ranked-window order statistics, the
    * [[Analytics.quantiles]] technique), doc count, and the keep rate
    * of the global filter. THE frame an adaptive curation threshold is
    * read from — a single global cutoff over-prunes clean domains and
    * under-prunes noisy ones. One signals map (source rides the
    * projection — no re-join) + one window shuffle on source.
    */
  def qualityDomain(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sig = filterSignals(
      Tables.documents(s, d).select(col("doc_id"), col("source"), col("text")),
      passthrough = Seq("source"))
    val w = Window.partitionBy(col("source")).orderBy(col("quality"), col("doc_id"))
    sig
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("source"))).cast("long"))
      .groupBy(col("source"))
      .agg(max(col("n")).as("n_docs"),
        max(when(col("rn") === ceil(col("n") * 0.5), col("quality"))).as("q50"),
        max(when(col("rn") === ceil(col("n") * 0.9), col("quality"))).as("q90"),
        TextSim.r6(sum(col("keep").cast("long")).cast("double") /
          count(lit(1))).as("keep_rate"))
      .orderBy(col("source"))
  }

  val qualityDomainSql: String =
    s"""WITH ${signalsSqlCte(", source")},
       |ranked AS (
       |  SELECT source, quality, keep,
       |         row_number() OVER (PARTITION BY source
       |                            ORDER BY quality, doc_id) AS rn,
       |         count(*) OVER (PARTITION BY source) AS n
       |  FROM (SELECT *, (quality >= 0.5 AND is_en AND dup_fraction <= 0.2) AS keep
       |        FROM scored)
       |)
       |SELECT source, max(n)::BIGINT AS n_docs,
       |       max(CASE WHEN rn = ceil(n * 0.5) THEN quality END) AS q50,
       |       max(CASE WHEN rn = ceil(n * 0.9) THEN quality END) AS q90,
       |       ${TextSim.r6Sql("sum(CASE WHEN keep THEN 1 ELSE 0 END)::DOUBLE / count(*)::DOUBLE")} AS keep_rate
       |FROM ranked
       |GROUP BY source
       |ORDER BY source""".stripMargin

  /** q_filter_domain — the CONSUMER of [[qualityDomain]]'s calibration,
    * closing the adaptive-curation loop: a doc is kept against its OWN
    * source's quality median instead of the global 0.5 cutoff (a single
    * global threshold over-prunes clean domains and under-prunes noisy
    * ones — the exact failure q_quality_domain was built to expose).
    *
    * Scale shape: ONE signals projection (persisted barrier, read
    * twice), one window shuffle on source to take the exact per-source
    * median, and the resulting ≤|domains| threshold frame is BROADCAST
    * back into the fused keep decision — the corpus is never joined to
    * itself and never shuffled on doc_id.
    */
  def filterDomain(s: SparkSession, d: String): DataFrame = {
    val sig = filterSignals(
      Tables.documents(s, d).select(col("doc_id"), col("source"), col("text")),
      passthrough = Seq("source")).persist()
    sig.join(broadcast(domainThresholds(sig)), "source")
      .select(col("doc_id"), col("source"), col("quality"), col("q50"),
        (col("quality") >= col("q50") && col("is_en") &&
          col("dup_fraction") <= 0.2).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** Per-source median-quality thresholds from a [[filterSignals]]
    * frame — the ≤|domains| calibration table [[filterDomain]] (batch)
    * and [[graft.streaming.StreamingFilterDomain]] (stream-static
    * broadcast) both consume. Exact p50 via the ranked-window order
    * statistic; one window shuffle on source, output rows ≤ |domains|.
    */
  def domainThresholds(sig: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("quality"), col("doc_id"))
    sig
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("source"))).cast("long"))
      .groupBy(col("source"))
      .agg(max(when(col("rn") === ceil(col("n") * 0.5), col("quality"))).as("q50"))
  }

  val filterDomainSql: String =
    s"""WITH ${signalsSqlCte(", source")},
       |ranked AS (
       |  SELECT source, quality,
       |         row_number() OVER (PARTITION BY source
       |                            ORDER BY quality, doc_id) AS rn,
       |         count(*) OVER (PARTITION BY source) AS n
       |  FROM scored
       |), thresholds AS (
       |  SELECT source, max(CASE WHEN rn = ceil(n * 0.5) THEN quality END) AS q50
       |  FROM ranked GROUP BY source
       |)
       |SELECT s.doc_id, s.source, s.quality, t.q50,
       |       (s.quality >= t.q50 AND s.is_en AND s.dup_fraction <= 0.2) AS keep
       |FROM scored s JOIN thresholds t ON s.source = t.source
       |ORDER BY s.doc_id""".stripMargin

  /** q_tokens — token counting three ways: whitespace tokens, regex
    * word/number/symbol tokens, and a BPE-ish subword estimate
    * (ceil(len/4) pieces per word — long words split into 4-char units).
    */
  def tokens(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"), TextSim.tokens(col("text")).as("t"))
      .select(col("doc_id"),
        size(col("t")).cast("long").as("ws_tokens"),
        regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).cast("long")
          .as("re_tokens"),
        aggregate(col("t"), lit(0L), (a, w) =>
          a + ceil(length(w).cast("double") / 4.0).cast("long")).as("bpe_tokens"))
      .orderBy(col("doc_id"))

  val tokensSql: String =
    s"""SELECT doc_id,
       |       len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT AS ws_tokens,
       |       len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))::BIGINT AS re_tokens,
       |       list_sum(list_transform(
       |         list_filter(string_split(text, ' '), x -> x <> ''),
       |         w -> ceil(len(w)::DOUBLE / 4.0)::BIGINT))::BIGINT AS bpe_tokens
       |FROM documents
       |ORDER BY doc_id""".stripMargin

  /** q_gopher — the Gopher-style rule battery (Rae et al. 2021, the
    * canonical pretraining quality gates) as ONE fused per-row
    * projection: word-count bounds, mean-word-length bounds, minimum
    * distinct stopwords, and the duplicate-3-gram ceiling — each rule
    * reported separately (curation wants to know WHY a doc dropped,
    * not just that it did) plus the conjunction. Like [[filterMask]],
    * never a join of the signal queries.
    */
  def gopher(s: SparkSession, d: String): DataFrame = {
    val en = Profiles.head._2
    val base = Tables.documents(s, d)
      .select(col("doc_id"), TextSim.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"),
        size(col("t")).cast("long").as("n_words"),
        aggregate(col("t"), lit(0L), (a, w) => a + length(w)).as("wlen_sum"),
        size(array_intersect(array_distinct(col("t")),
          array(en.map(lit): _*))).cast("long").as("n_stop_distinct"),
        (size(col("t")) - 2).cast("long").as("n_grams"),
        size(TextSim.shingles3(col("t"))).cast("long").as("n_distinct_grams"))
    base.select(col("doc_id"), col("n_words"),
      TextSim.r6(col("wlen_sum").cast("double") / col("n_words")).as("mean_wlen"),
      col("n_stop_distinct"),
      TextSim.r6((col("n_grams") - col("n_distinct_grams")).cast("double") /
        col("n_grams")).as("dup3"),
      (col("n_words") >= 50 && col("n_words") <= 100000).as("rule_wc"),
      (TextSim.r6(col("wlen_sum").cast("double") / col("n_words")) >= 3.0 &&
        TextSim.r6(col("wlen_sum").cast("double") / col("n_words")) <= 10.0)
        .as("rule_wlen"),
      (col("n_stop_distinct") >= 2).as("rule_stop"),
      (TextSim.r6((col("n_grams") - col("n_distinct_grams")).cast("double") /
        col("n_grams")) <= 0.2).as("rule_rep"))
      .withColumn("pass",
        col("rule_wc") && col("rule_wlen") && col("rule_stop") && col("rule_rep"))
      .orderBy(col("doc_id"))
  }

  val gopherSql: String = {
    val stopList = Profiles.head._2.map(w => s"'$w'").mkString(", ")
    val mw = TextSim.r6Sql("wlen_sum::DOUBLE / n_words")
    val dup = TextSim.r6Sql("(n_grams - n_distinct_grams)::DOUBLE / n_grams")
    s"""WITH base AS (
       |  SELECT doc_id, len(t)::BIGINT AS n_words,
       |         list_sum(list_transform(t, w -> len(w)))::BIGINT AS wlen_sum,
       |         len(list_intersect(list_distinct(t), [$stopList]))::BIGINT AS n_stop_distinct,
       |         (len(t) - 2)::BIGINT AS n_grams,
       |         len(${TextSim.shingles3Sql("t")})::BIGINT AS n_distinct_grams
       |  FROM (SELECT doc_id,
       |               list_filter(string_split(text, ' '), x -> x <> '') AS t
       |        FROM documents)
       |  WHERE len(t) >= 3
       |)
       |SELECT doc_id, n_words, $mw AS mean_wlen, n_stop_distinct,
       |       $dup AS dup3,
       |       (n_words >= 50 AND n_words <= 100000) AS rule_wc,
       |       ($mw >= 3.0 AND $mw <= 10.0) AS rule_wlen,
       |       (n_stop_distinct >= 2) AS rule_stop,
       |       ($dup <= 0.2) AS rule_rep,
       |       ((n_words >= 50 AND n_words <= 100000) AND ($mw >= 3.0 AND $mw <= 10.0)
       |        AND (n_stop_distinct >= 2) AND ($dup <= 0.2)) AS pass
       |FROM base
       |ORDER BY doc_id""".stripMargin
  }

  /** q_fertility — per-source tokenizer-fertility report: how many
    * subword pieces the BPE-ish tokenizer spends per whitespace word
    * and per byte, by domain. The signal that decides whether a domain
    * is cheap or expensive to train on at a fixed token budget (code
    * and tables tokenize fat; prose tokenizes lean). One partial-agg
    * groupBy on source — the corpus never shuffles by doc.
    */
  def fertility(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("source"), col("text"), TextSim.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 1)
      .select(col("source"),
        length(col("text")).cast("long").as("n_chars"),
        size(col("t")).cast("long").as("ws_tokens"),
        aggregate(col("t"), lit(0L), (a, w) =>
          a + ceil(length(w).cast("double") / 4.0).cast("long")).as("bpe_tokens"))
      .groupBy(col("source"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("ws_tokens")).cast("long").as("ws_tokens"),
        sum(col("bpe_tokens")).cast("long").as("bpe_tokens"),
        TextSim.r6(sum(col("bpe_tokens")).cast("double") /
          sum(col("ws_tokens"))).as("fertility"),
        TextSim.r6(sum(col("n_chars")).cast("double") /
          sum(col("bpe_tokens"))).as("chars_per_tok"))
      .orderBy(col("source"))

  val fertilitySql: String =
    s"""WITH base AS (
       |  SELECT source, len(text)::BIGINT AS n_chars,
       |         len(t)::BIGINT AS ws_tokens,
       |         list_sum(list_transform(t,
       |           w -> ceil(len(w)::DOUBLE / 4.0)::BIGINT))::BIGINT AS bpe_tokens
       |  FROM (SELECT source, text,
       |               list_filter(string_split(text, ' '), x -> x <> '') AS t
       |        FROM documents)
       |  WHERE len(t) >= 1
       |)
       |SELECT source, count(*)::BIGINT AS n_docs,
       |       sum(ws_tokens)::BIGINT AS ws_tokens,
       |       sum(bpe_tokens)::BIGINT AS bpe_tokens,
       |       ${TextSim.r6Sql("sum(bpe_tokens)::DOUBLE / sum(ws_tokens)")} AS fertility,
       |       ${TextSim.r6Sql("sum(n_chars)::DOUBLE / sum(bpe_tokens)")} AS chars_per_tok
       |FROM base
       |GROUP BY source
       |ORDER BY source""".stripMargin

  val BpeTopK = 20

  /** q_bpe_merges — the first BPE merge table: corpus-weighted
    * adjacent character-pair counts, ranked (the inner loop of
    * tokenizer training — [[fertility]] measures a tokenizer's cost,
    * this is its learning face). Scale shape: pair enumeration runs
    * over the VOCAB (one corpus pass folds tokens to (word, tf); the
    * char-pair explode touches |vocab| rows, not the corpus), counts
    * are weighted by tf, and the head is a TakeOrdered partial top-k —
    * the [[Corpus.vocab]] pattern applied to subword statistics.
    */
  def bpeMerges(s: SparkSession, d: String): DataFrame = {
    val vocab = Tables.documents(s, d)
      .select(explode(TextSim.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).cast("long").as("tf"))
      .filter(length(col("w")) >= 2)
    vocab
      .select(col("tf"), explode(transform(
        sequence(lit(1), length(col("w")) - 1),
        i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair"))
      .agg(sum(col("tf")).cast("long").as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(BpeTopK)
  }

  val bpeMergesSql: String =
    s"""WITH vocab AS (
       |  SELECT w, count(*)::BIGINT AS tf FROM (
       |    SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
       |    FROM documents)
       |  GROUP BY w HAVING len(w) >= 2
       |), pairs AS (
       |  SELECT tf, unnest([w[i : i + 1] for i in range(1, len(w))]) AS pair
       |  FROM vocab
       |)
       |SELECT pair, sum(tf)::BIGINT AS n
       |FROM pairs
       |GROUP BY pair
       |ORDER BY n DESC, pair
       |LIMIT $BpeTopK""".stripMargin

  val K = 8 // fingerprint char k-gram size
  val W = 4 // winnowing window (in k-grams)

  /** q_fingerprint — winnowing document fingerprint (Schleimer et al.,
    * SIGMOD'03 "local algorithms for document fingerprinting"): char
    * 8-gram hashes, min per 4-gram window, distinct mins per doc.
    */
  def fingerprint(s: SparkSession, d: String): DataFrame =
    // fused native winnowing kernel ([[graft.functions.WinnowFps]]):
    // bit-identical to the composed md5-chargram → window-min →
    // distinct chain the oracle mirrors, one byte-array pass per doc,
    // no persist barriers (nothing left for project-collapse to
    // re-derive), 3.1 s → 0.2 s at sf0.1 (q_fp_overlap 6.2 → 1.8 s)
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"))
      .filter(length(col("text")) >= K + W - 1)
      .select(col("doc_id"),
        graft.functions.WinnowFps(col("text"), K, W).as("fps"))
      .select(col("doc_id"),
        size(col("fps")).cast("long").as("n_fingerprints"),
        array_min(col("fps")).as("min_fp"),
        array_max(col("fps")).as("max_fp"))
      .orderBy(col("doc_id"))

  val fingerprintSql: String =
    s"""WITH h AS (
       |  SELECT doc_id,
       |         [('0x' || substr(md5(substr(text, i, $K)), 1, 7))::BIGINT
       |          for i in range(1, len(text) - ${K - 1} + 1)] AS h
       |  FROM documents WHERE len(text) >= ${K + W - 1}
       |), fp AS (
       |  SELECT doc_id,
       |         list_distinct([list_min(h[i : i + ${W - 1}])
       |                        for i in range(1, len(h) - ${W - 1} + 1)]) AS fps
       |  FROM h
       |)
       |SELECT doc_id, len(fps)::BIGINT AS n_fingerprints,
       |       list_min(fps) AS min_fp, list_max(fps) AS max_fp
       |FROM fp
       |ORDER BY doc_id""".stripMargin
}
