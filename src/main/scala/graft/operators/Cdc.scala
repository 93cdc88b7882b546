package graft.operators

import graft.Tables
import graft.functions.TextSim
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC) — chunk boundaries decided by
  * CONTENT (a word whose hash is ≡ 0 mod D ends a chunk), not by
  * position or size. The property this buys is shift resistance:
  * editing or prepending text only perturbs chunks up to the next cut
  * word — every chunk after it is byte-identical to the unedited
  * version, so chunk-level identities (and the vector-store upserts
  * keyed on them) survive document edits. The reference's greedy
  * chunker (chunk_text, Notion_openai_vector_etl.py:239-251 — our
  * [[Etl.chunk]]) re-chunks the whole document on any edit and every
  * downstream chunk id changes; CDC is the incremental-friendly
  * alternative, the storage-dedup idea (content-defined blocks,
  * LBFS/rsync family) applied at word granularity where an LLM corpus
  * lives.
  *
  * Scale shape: chunking is a pure per-row HOF pipeline (cut flags →
  * start positions → slices) riding the scan — no shuffle at all until
  * a consumer aggregates. The cross-doc duplicated-chunk report is the
  * standard one partial-agg groupBy on the chunk hash. Cut decisions
  * hash single words (md5-derived, house hash family), so both engines
  * agree bit-for-bit.
  */
object Cdc {

  /** Boundary divisor: a word cuts iff md5-bucket % D == 0 → mean
    * chunk ≈ D words.
    */
  val D = 16

  // Spark side: the native [[graft.functions.Md5Buckets]] pass — the
  // same `('0x' || substr(md5('cdc:' || w), 1, 7))::BIGINT % D` value
  // read off digest bytes (bit-parity is what the oracle checks).
  private def isCutSql(w: String): String =
    s"('0x' || substr(md5('cdc:' || $w), 1, 7))::BIGINT % $D = 0"

  /** Per-doc CDC chunks over any `(doc_id, text)` frame:
    * `(doc_id, chunk_index, n_words, chunk_hash, chunk_text)` — pure
    * per-row HOFs + one posexplode, zero shuffle.
    */
  def chunks(docs: DataFrame): DataFrame = {
    val t = col("t")
    // PERF: chunk bounds via zip_with over two bound arrays evaluated
    // ONCE per row. The element_at(starts, j)-inside-a-lambda form
    // re-inlines the full md5 cut scan PER CHUNK ELEMENT under project
    // collapse (the minhash-barrier failure mode, SURVEY §5) —
    // measured 42 s at sf0.1 vs ~2 s for this shape. `cuts` is still
    // inlined twice (starts + ends): 2·n word hashes per row, flat —
    // and each hash pass is the native [[graft.functions.Md5Buckets]]
    // loop (digest bytes, no hex-string conv), not a per-element
    // interpreted md5 chain.
    // Cut positions are 1..n-1 (a cut at the last word starts no chunk).
    val cuts = filter(zip_with(
      graft.functions.Md5Buckets.salted(t, "cdc:", D),
      sequence(lit(1), size(t)),
      (b, i) => when(b === 0 && i < size(t), i)),
      x => x.isNotNull)
    assemble(docs
      .select(col("doc_id"), TextSim.tokens(col("text")).as("t"))
      .filter(size(t) >= 1)
      .withColumn("cuts", cuts))
  }

  /** `(doc_id, t, cuts)` → chunk rows: cut positions to start/end
    * bounds to slices, one posexplode. Shared by the unclamped and the
    * clamped chunkers — identical downstream identity arithmetic.
    */
  private def assemble(toks: DataFrame): DataFrame = {
    val t = col("t")
    toks
      .withColumn("chunks", zip_with(
        concat(array(lit(1)), transform(col("cuts"), i => i + 1)),
        concat(col("cuts"), array(size(t))),
        (s, e) => concat_ws(" ", slice(t, s, e - s + 1))))
      .select(col("doc_id"), posexplode(col("chunks")).as(Seq("p", "chunk_text")))
      .select(col("doc_id"), (col("p") + 1).cast("long").as("chunk_index"),
        size(split(col("chunk_text"), " ")).cast("long").as("n_words"),
        md5(col("chunk_text")).as("chunk_hash"), col("chunk_text"))
  }

  /** FastCDC-style clamped CDC: a content cut is honored only once the
    * growing chunk has `minWords`, and a chunk that reaches `maxWords`
    * is cut regardless — bounding every chunk in `[minWords,
    * maxWords]` words (the terminal chunk may run short; nothing can
    * run long). The unclamped [[chunks]] has no bound at all: a
    * cut-word drought yields one giant chunk (an embedding-window
    * blowout downstream), a flood yields confetti. Clamping trades a
    * sliver of shift resistance for those bounds — after an edit,
    * boundaries re-synchronize at the first content-defined cut the
    * min-clamp accepts on both sides, rather than at the very next
    * cut word (the FastCDC normalization trade, Xia et al., ATC'16).
    *
    * Same scale shape as [[chunks]]: the clamp is a single native
    * linear scan over the cut flags ([[graft.functions.BoundedCuts]]
    * — the accept walk is inherently sequential, and the
    * `aggregate`-HOF spelling paid a struct per word plus an array
    * copy per accepted cut, measured 3.9 s vs 1.1 s unclamped at
    * sf0.1; the kernel form is O(n) with zero per-element
    * allocation) — still zero shuffle, still ONE Md5Buckets hash
    * pass (the unclamped form inlines two).
    */
  def boundedChunks(docs: DataFrame,
    minWords: Int, maxWords: Int): DataFrame = {
    val t = col("t")
    val accepted = graft.functions.BoundedCuts.of(
      graft.functions.Md5Buckets.salted(t, "cdc:", D), minWords, maxWords)
    assemble(docs
      .select(col("doc_id"), TextSim.tokens(col("text")).as("t"))
      .filter(size(t) >= 1)
      .withColumn("cuts", accepted))
  }

  /** Shared SQL: CDC chunks as a CTE pipeline over a docs relation. */
  private def chunksSqlFrom(rel: String): String =
    s"""toks AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
       |  FROM $rel
       |), base AS (
       |  SELECT doc_id, t, len(t) AS n,
       |         [1] || [i + 1 for i in range(1, len(t))
       |                 if ${isCutSql("t[i]")}] AS starts
       |  FROM toks WHERE len(t) >= 1
       |), numbered AS (
       |  SELECT doc_id, t, n, starts,
       |         unnest(range(1, len(starts) + 1)) AS j
       |  FROM base
       |), chunks AS (
       |  SELECT doc_id, j::BIGINT AS chunk_index,
       |         array_to_string(t[starts[j] : CASE WHEN j < len(starts)
       |           THEN starts[j + 1] - 1 ELSE n END], ' ') AS chunk_text
       |  FROM numbered
       |)""".stripMargin

  /** q_cdc_chunk — CDC chunk inventory of the pristine corpus. */
  def cdcChunk(s: SparkSession, d: String): DataFrame =
    chunks(Tables.documents(s, d))
      .orderBy(col("doc_id"), col("chunk_index"))

  val cdcChunkSql: String =
    s"""WITH ${chunksSqlFrom("documents")}
       |SELECT doc_id, chunk_index,
       |       len(string_split(chunk_text, ' '))::BIGINT AS n_words,
       |       md5(chunk_text) AS chunk_hash, chunk_text
       |FROM chunks
       |ORDER BY doc_id, chunk_index""".stripMargin

  /** Clamp bounds for the oracle-checked bounded chunker: mean chunk
    * is D = 16 words, so [8, 32] brackets it at 0.5×/2×.
    */
  val BoundedMin = 8
  val BoundedMax = 32

  /** q_cdc_bounded — [[boundedChunks]] over the pristine corpus,
    * hash-checked against a recursive-CTE mirror of the clamped scan:
    * the oracle walks each doc's cut candidates with the same
    * accept-iff (content-cut ∧ gap ≥ min) ∨ gap ≥ max rule, one
    * recursion step per accepted boundary.
    */
  def cdcBounded(s: SparkSession, d: String): DataFrame =
    boundedChunks(Tables.documents(s, d), BoundedMin, BoundedMax)
      .orderBy(col("doc_id"), col("chunk_index"))

  val cdcBoundedSql: String =
    s"""WITH RECURSIVE toks AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
       |  FROM documents
       |), base AS (
       |  SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) >= 1
       |), pos AS (
       |  SELECT doc_id, i, ${isCutSql("t[i]")} AS is_cut
       |  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM base)
       |), rec(doc_id, cut) AS (
       |  SELECT doc_id, 0 FROM base
       |  UNION ALL
       |  SELECT doc_id, nxt FROM (
       |    SELECT r.doc_id,
       |           (SELECT min(p.i) FROM pos p
       |            WHERE p.doc_id = r.doc_id AND p.i > r.cut
       |              AND ((p.is_cut AND p.i - r.cut >= $BoundedMin)
       |                   OR p.i - r.cut >= $BoundedMax)) AS nxt
       |    FROM rec r)
       |  WHERE nxt IS NOT NULL
       |), chunks AS (
       |  SELECT c.doc_id,
       |         row_number() OVER (PARTITION BY c.doc_id ORDER BY c.cut)::BIGINT AS chunk_index,
       |         array_to_string(b.t[c.cut + 1 :
       |           coalesce(lead(c.cut) OVER (PARTITION BY c.doc_id ORDER BY c.cut), b.n)],
       |           ' ') AS chunk_text
       |  FROM rec c JOIN base b ON b.doc_id = c.doc_id
       |)
       |SELECT doc_id, chunk_index,
       |       len(string_split(chunk_text, ' '))::BIGINT AS n_words,
       |       md5(chunk_text) AS chunk_hash, chunk_text
       |FROM chunks
       |ORDER BY doc_id, chunk_index""".stripMargin

  /** q_cdc_dedup — cross-doc duplicated chunks over the dup-injected
    * corpus: the near-copy clones (suffix appended) share every chunk
    * EXCEPT their last with their source — sub-document exact dedup
    * that survives the edit, which whole-doc hashing ([[Dedup.exact]])
    * misses and fixed-size chunking would misalign. One partial-agg
    * groupBy on the chunk hash.
    */
  def cdcDedup(s: SparkSession, d: String): DataFrame =
    chunks(Tables.docsAug(s, d))
      .groupBy(col("chunk_hash"))
      .agg(count(lit(1)).cast("long").as("n_copies"),
        countDistinct(col("doc_id")).cast("long").as("n_docs"),
        min(col("doc_id")).as("keep_doc"))
      .filter(col("n_copies") >= 2)
      .orderBy(col("chunk_hash"))

  val cdcDedupSql: String =
    s"""WITH ${Tables.docsAugSql},
       |${chunksSqlFrom("docs_aug")}
       |SELECT md5(chunk_text) AS chunk_hash,
       |       count(*)::BIGINT AS n_copies,
       |       count(DISTINCT doc_id)::BIGINT AS n_docs,
       |       min(doc_id) AS keep_doc
       |FROM chunks
       |GROUP BY 1
       |HAVING count(*) >= 2
       |ORDER BY chunk_hash""".stripMargin
}
