package graft.operators

import graft.Tables
import graft.functions.TextSim
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact repeated-substring detection — the substring-level dedup of
  * Lee et al., "Deduplicating Training Data Makes Language Models
  * Better" (2022) — re-expressed scan-shaped for Spark instead of a
  * suffix array. A character k-gram occurring more than once anywhere
  * in the corpus marks every position it covers as duplicated text;
  * overlapping flagged positions merge into maximal spans per
  * document. (Reference corpus analogue: repeated chunk content across
  * pages, Notion_openai_vector_etl.py:189-213 chunking surface.)
  *
  * Scale shape:
  *   - Grams are a flatMap on the scan (`sequence` + `explode`,
  *     codegen); the shuffle rows carry `(xxhash64 gram, doc_id, pos)`
  *     — 8-byte hashes, never text.
  *   - The duplicated-gram set is one partial-agg groupBy on the hash
  *     (`HAVING count >= 2`); the hit join is hash-co-partitioned on
  *     the same key. The gram projection is deliberately recomputed on
  *     the join side rather than persisted: a scan-side flatMap costs
  *     less than materializing the full gram table (contrast the
  *     minhash persist barrier, whose signatures feed MANY band
  *     probes; grams feed exactly two consumers once).
  *   - A suffix array is a pointer-chasing global structure Spark
  *     cannot build or probe scan-shaped; the k-gram formulation is
  *     embarrassingly partition-parallel and loses only the ability to
  *     find duplicated runs SHORTER than k, which substring dedup
  *     does not want anyway (k IS the minimum-match-length knob).
  *   - At 100 TB stride sampling is NOT sound (two copies of a run at
  *     different alignments sample disjoint positions); `modP` is
  *     0-mod-p CONTENT sampling (the MOSS / winnowing family,
  *     Schleimer et al. 2003): keep a gram iff `hash % p == 0`.
  *     Selection depends only on gram content, so every copy of a
  *     duplicated run keeps the same grams — cross-copy detection
  *     survives sampling, gram volume drops p×, and a run of length L
  *     is detected with probability 1-(1-1/p)^(L-k+1) (≥ 99% for
  *     L ≥ k + 4.6·p). Flagged spans then cover the sampled grams
  *     only, so reported `dup_chars` is a lower bound on the exact
  *     mode's — asserted in [[graft.SubstrSpec]].
  *   - Islands per doc: one shuffle on doc_id, O(1) window state (a
  *     running max of span ends), per-group width bounded by document
  *     length. Output is one row per flagged document.
  */
object Substr {

  /** Minimum duplicated-run length in characters (the Lee et al.
    * equivalent knob is 50 BPE tokens; 40 chars ≈ 8-10 tokens, scaled
    * to this corpus's ~300-char documents).
    */
  val GramLen = 40

  /** Per-position k-gram hashes: `(doc_id, pos, g)`, one row per
    * position with a full gram to its right. The hash array is the
    * one-pass native [[graft.functions.GramHash]] sliding-window
    * expression — the composable `xxhash64(substring(text, pos+1, k))`
    * form is quadratic in doc length (each substring call re-scans
    * for the char boundary and allocates a 40-byte copy per gram).
    * `modP > 1` applies 0-mod-p content sampling (see object doc).
    */
  def gramHashes(docs: DataFrame, k: Int = GramLen, modP: Int = 1): DataFrame = {
    val g = docs
      .select(col("doc_id"),
        posexplode(graft.functions.GramHash(col("text"), k)).as(Seq("pos", "g")))
    if (modP <= 1) g else g.filter(pmod(col("g"), lit(modP.toLong)) === 0)
  }

  /** Per-document duplicated-span report over any `(doc_id, text)`
    * frame: `(doc_id, n_spans, dup_chars, dup_frac)` for every doc
    * containing at least one corpus-duplicated k-gram. Adjacent and
    * overlapping flagged grams merge into maximal spans (running-max
    * island detection), so `dup_chars` counts each duplicated
    * character once.
    */
  def substrStats(docs: DataFrame, k: Int = GramLen, modP: Int = 1): DataFrame = {
    val grams = gramHashes(docs, k, modP)
    // Duplicated grams: count >= 2 over ALL occurrences (a within-doc
    // repeat is duplicated text too). In a mostly-unique corpus this
    // frame is far smaller than the gram frame; locally AQE may
    // broadcast it, at scale it stays a co-partitioned hash join on g.
    val dup = grams.groupBy(col("g"))
      .agg(count(lit(1)).as("n")).filter(col("n") >= 2)
      .select(col("g"))
    val hits = grams.join(dup, "g").select(col("doc_id"), col("pos"))
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val prevEnd = byDoc.rowsBetween(Window.unboundedPreceding, -1)
    val runSum = byDoc.rowsBetween(Window.unboundedPreceding, 0)
    val islands = hits
      // new island iff this gram starts past every previous gram's end
      .withColumn("is_new",
        when(col("pos") > coalesce(max(col("pos") + k).over(prevEnd), lit(-1)), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("is_new")).over(runSum))
    val spans = islands.groupBy(col("doc_id"), col("island"))
      .agg((max(col("pos")) + k - min(col("pos"))).cast("long").as("span_chars"))
    val perDoc = spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"), sum(col("span_chars")).as("dup_chars"))
    perDoc
      .join(docs.select(col("doc_id"), length(col("text")).as("len")), "doc_id")
      .select(col("doc_id"), col("n_spans"), col("dup_chars"),
        TextSim.r6(col("dup_chars").cast("double") / col("len")).as("dup_frac"))
      .orderBy(col("doc_id"))
  }

  /** q_substr_dedup — [[substrStats]] on the duplicate-injected corpus
    * (exact mode: every gram, the DuckDB-mirrorable semantics).
    */
  def substrDedup(s: SparkSession, d: String): DataFrame =
    substrStats(Tables.docsAug(s, d))

  val substrDedupSql: String =
    s"""WITH ${Tables.docsAugSql},
       |positions AS (
       |  SELECT doc_id, text, unnest(range(0, len(text) - ${GramLen - 1})) AS pos
       |  FROM docs_aug WHERE len(text) >= $GramLen
       |), grams AS (
       |  SELECT doc_id, pos, substr(text, pos::INT + 1, $GramLen) AS g FROM positions
       |), dup AS (
       |  SELECT g FROM grams GROUP BY g HAVING count(*) >= 2
       |), hits AS (
       |  SELECT doc_id, pos FROM grams WHERE g IN (SELECT g FROM dup)
       |), islands AS (
       |  SELECT doc_id, pos,
       |         CASE WHEN pos > coalesce(max(pos + $GramLen) OVER (
       |           PARTITION BY doc_id ORDER BY pos
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
       |         THEN 1 ELSE 0 END AS is_new
       |  FROM hits
       |), numbered AS (
       |  SELECT doc_id, pos, sum(is_new) OVER (
       |    PARTITION BY doc_id ORDER BY pos
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
       |  FROM islands
       |), spans AS (
       |  SELECT doc_id, island, (max(pos) + $GramLen - min(pos))::BIGINT AS span_chars
       |  FROM numbered GROUP BY doc_id, island
       |), per_doc AS (
       |  SELECT doc_id, count(*)::BIGINT AS n_spans, sum(span_chars)::BIGINT AS dup_chars
       |  FROM spans GROUP BY doc_id
       |)
       |SELECT p.doc_id, n_spans, dup_chars,
       |       ${TextSim.r6Sql(s"dup_chars::DOUBLE / len(a.text)")} AS dup_frac
       |FROM per_doc p JOIN docs_aug a ON p.doc_id = a.doc_id
       |ORDER BY p.doc_id""".stripMargin
}
