package graft.operators

import graft.Tables
import graft.functions.TextSim
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sliding-window chunking with overlap — the fixed-context embedding
  * chunker (window W tokens, stride S < W, so consecutive chunks share
  * W−S tokens of context). The house chunker family covers greedy
  * char-packing ([[Etl.chunk]], the reference's rule) and
  * content-defined boundaries ([[Cdc]], edit-stable identities); this
  * is the third standard shape: RETRIEVAL wants every token to appear
  * with enough left context to be findable, which boundary chunkers
  * can't promise — a fact split across a CDC cut is in neither chunk's
  * context window. The trade is written out: overlap re-embeds each
  * token ~W/S times (4/3 at the defaults) and chunk ids are
  * position-based (an edit re-keys the doc's tail — the exact
  * weakness [[Cdc]] exists to avoid), so this feeds retrieval
  * windows, CDC feeds incremental upsert.
  *
  * Window starts are the arithmetic progression 1, 1+S, 1+2S, …, with
  * the LAST start clamped to n−W+1 (FINAL-WINDOW CLAMP): every chunk
  * is exactly W tokens (short docs yield one whole-doc chunk), no
  * degenerate tail fragments, and the tail carries full context.
  *
  * Scale shape: a pure per-row HOF projection (starts array → slices)
  * riding the scan — no shuffle, no UDF; output volume is the input
  * ×W/S, which is the operator's cost statement, not a plan defect.
  */
object WindowChunk {

  val W = 32
  val S = 24

  /** Sliding chunks of a `(idCol, textCol)` frame. */
  def slide(docs: DataFrame, idCol: String, textCol: String,
    w: Int = W, s: Int = S): DataFrame = {
    require(s > 0 && s < w, "stride must be in (0, window)")
    val toks = docs
      .select(col(idCol), TextSim.tokens(col(textCol)).as("t"))
      .filter(size(col("t")) >= 1)
      .withColumn("n", size(col("t")).cast("long"))
    // number of windows: 1 + ceil((n-W)/S); the floor-division double
    // is exact for any realistic doc length
    val nw = when(col("n") <= w, lit(1L))
      .otherwise(floor((col("n") - w + s - 1) / s).cast("long") + 1L)
    toks
      .withColumn("starts",
        transform(sequence(lit(0L), nw - 1L), i =>
          greatest(least(i * s + 1L, col("n") - w + 1L), lit(1L))))
      .select(col(idCol), col("n"), col("t"),
        posexplode(col("starts")).as(Seq("chunk_index", "start_tok")))
      .select(col(idCol),
        col("chunk_index").cast("long").as("chunk_index"),
        col("start_tok"),
        least(lit(w.toLong), col("n")).as("n_tokens"),
        concat_ws(" ", slice(col("t"), col("start_tok").cast("int"), lit(w)))
          .as("chunk_text"))
  }

  /** q_chunk_overlap — W=32/S=24 sliding windows over the corpus. */
  def chunkOverlap(sp: SparkSession, d: String): DataFrame =
    slide(Tables.documents(sp, d), "doc_id", "text")
      .orderBy(col("doc_id"), col("chunk_index"))

  val chunkOverlapSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
       |  FROM documents
       |), d AS (
       |  SELECT doc_id, t, len(t)::BIGINT AS n,
       |         CASE WHEN len(t) <= $W THEN 1
       |              ELSE ((len(t) - $W + $S - 1) // $S) + 1 END AS m
       |  FROM toks WHERE len(t) >= 1
       |)
       |SELECT doc_id, i::BIGINT AS chunk_index,
       |       greatest(least(1 + i * $S, n - $W + 1), 1)::BIGINT AS start_tok,
       |       least($W, n)::BIGINT AS n_tokens,
       |       array_to_string(list_slice(t,
       |         greatest(least(1 + i * $S, n - $W + 1), 1),
       |         greatest(least(1 + i * $S, n - $W + 1), 1) + $W - 1), ' ') AS chunk_text
       |FROM d, unnest(range(0, m)) AS r(i)
       |ORDER BY doc_id, chunk_index""".stripMargin
}
