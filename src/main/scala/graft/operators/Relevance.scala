package graft.operators

import graft.Tables
import graft.functions.TextSim
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lexical relevance scoring — the keyword-retrieval twin of the vector
  * side (the reference serves a vector store,
  * Notion_openai_vector_etl.py:329-344; a production corpus pipeline
  * pairs it with BM25 for hybrid retrieval and for query-driven corpus
  * selection during training-data curation).
  *
  * Scale shape: the term set is bounded (a query, not the corpus), so
  * tf per term is a fused per-row projection over the scan — the corpus
  * NEVER shuffles. The only aggregates are one 1-row global stats frame
  * (N, avgdl, df per term) broadcast back over the scoring map — the
  * [[Quantize]] stats pattern applied to retrieval. At 100 TB: one scan
  * to calibrate df, one scan to score; both pipelined, no exchange
  * keyed on the corpus.
  */
object Relevance {

  /** Fixed query-term set (bounded by contract, like [[TextAnalysis.Profiles]]). */
  val Terms: Seq[String] = Seq("spark", "query", "join", "stream", "window", "hash")
  val K1 = 1.2
  val B = 0.75

  /** q_bm25 — Okapi BM25 of every document against [[Terms]]:
    * idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)) (the non-negative
    * "plus-one" idf), tf saturation k1=1.2, length normalization
    * b=0.75. All arithmetic in doubles with the operation order
    * mirrored exactly in the oracle; the one libm call (ln) sits
    * under round-6 on both engines.
    */
  def bm25(s: SparkSession, d: String): DataFrame = {
    val tf = Tables.documents(s, d)
      .select(col("doc_id"), TextSim.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 1)
      .select(Seq(col("doc_id"), size(col("t")).cast("long").as("dl")) ++
        Terms.zipWithIndex.map { case (w, i) =>
          size(filter(col("t"), x => x === w)).cast("long").as(s"tf$i")
        }: _*)
    // 1-row stats frame: corpus size, average doc length, df per term.
    val stats = tf.agg(
      count(lit(1)).cast("long").as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl") +:
        Terms.indices.map(i =>
          sum((col(s"tf$i") > 0).cast("long")).cast("long").as(s"df$i")): _*)
    // IEEE add/mult are commutative, so Column-op-Double forms below are
    // bit-identical to the oracle's `0.25 + 0.75 * x` / `1.2 * y` order.
    val contrib: Seq[org.apache.spark.sql.Column] = Terms.indices.map { i =>
      val idf = log(lit(1.0) +
        ((col("n_docs") - col(s"df$i")).cast("double") + 0.5) /
          (col(s"df$i").cast("double") + 0.5))
      val denom = col(s"tf$i").cast("double") +
        ((col("dl").cast("double") / col("avgdl")) * B + (1.0 - B)) * K1
      idf * (col(s"tf$i").cast("double") * (K1 + 1.0)) / denom
    }
    tf.crossJoin(broadcast(stats))
      .select(col("doc_id"), col("dl"),
        Terms.indices.map(i => (col(s"tf$i") > 0).cast("long"))
          .reduce(_ + _).as("matched"),
        TextSim.r6(contrib.reduce(_ + _)).as("bm25"))
      .orderBy(col("doc_id"))
  }

  val bm25Sql: String = {
    val tfCols = Terms.zipWithIndex.map { case (w, i) =>
      s"len(list_filter(t, x -> x = '$w'))::BIGINT AS tf$i"
    }
    val dfCols = Terms.indices.map(i =>
      s"sum((tf$i > 0)::BIGINT)::BIGINT AS df$i")
    val matched = Terms.indices.map(i =>
      s"(tf$i > 0)::BIGINT").mkString(" + ")
    val contrib = Terms.indices.map { i =>
      s"""ln(1.0::DOUBLE + ((n_docs - df$i)::DOUBLE + 0.5::DOUBLE) / (df$i::DOUBLE + 0.5::DOUBLE))
         |         * (tf$i::DOUBLE * ${K1 + 1.0}::DOUBLE)
         |         / (tf$i::DOUBLE + $K1::DOUBLE * (${1.0 - B}::DOUBLE + $B::DOUBLE * (dl::DOUBLE / avgdl)))""".stripMargin
    }.mkString("\n       + ")
    s"""WITH tf AS (
       |  SELECT doc_id, len(t)::BIGINT AS dl,
       |         ${tfCols.mkString(",\n         ")}
       |  FROM (SELECT doc_id,
       |               list_filter(string_split(text, ' '), x -> x <> '') AS t
       |        FROM documents)
       |  WHERE len(t) >= 1
       |), stats AS (
       |  SELECT count(*)::BIGINT AS n_docs,
       |         sum(dl)::DOUBLE / count(*) AS avgdl,
       |         ${dfCols.mkString(",\n         ")}
       |  FROM tf
       |)
       |SELECT doc_id, dl, ($matched)::BIGINT AS matched,
       |       ${TextSim.r6Sql(contrib)} AS bm25
       |FROM tf, stats
       |ORDER BY doc_id""".stripMargin
  }
}
