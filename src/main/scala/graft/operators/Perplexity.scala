package graft.operators

import graft.Tables
import graft.functions.{Md5Buckets, TextSim}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LM-perplexity quality filtering (the CCNet recipe, Wenzek et al.,
  * LREC 2020: score web text by the cross-entropy of a small language
  * model trained on a clean reference corpus; keep the low-perplexity
  * head/middle). [[Corpus.dsir]] asks "does this doc's FEATURE MIX
  * look like the target"; this asks the sharper sequential question
  * "is this doc PREDICTABLE under a reference LM" — the classic
  * fluency screen that catches word salad, OCR noise, and
  * keyword-stuffed spam that per-feature ratios miss.
  *
  * The LM is a hashed-bigram model with Laplace smoothing, in the
  * house fixed-point discipline: reference-slice counts over
  * `B2`-bucketed word bigrams and `B1`-bucketed unigram CONTEXTS
  * (positions 1..n-1 — the word being conditioned ON), so
  * ln P(w_i | w_{i-1}) ≈ ln(c2(b(w_{i-1}w_i)) + 1) −
  * ln(c1(b(w_{i-1})) + B2). Both log tables are fixed to integer
  * MICRO-NATS independently before any per-doc sum, so the score is
  * exact long arithmetic — order-independent, hash-oracle-safe (the
  * q_dsir decimal-sum rule).
  *
  * Scale shape (dsir's exactly): calibration is two partial-agg
  * groupBys over the reference slice folding to ≤B1+B2 rows
  * (collected under the bounded-statistic contract); scoring is a
  * pure per-row `zip_with` + fold against the two constant-folded
  * literal tables riding the scan — the corpus never shuffles, and
  * the bigram buckets come from the same single native [[Md5Buckets]]
  * digest pass q_dsir uses.
  */
object Perplexity {

  /** Unigram-context buckets. */
  val B1 = 256
  /** Bigram buckets. */
  val B2 = 1024

  /** q_perplexity — per-doc cross-entropy of the non-reference corpus
    * under the reference-slice LM (reference = doc_id % EvalMod = 0,
    * the held-out convention shared with q_dsir/q_contamination):
    * `(doc_id, n_grams, xent_micro, xent)`, xent in nats/gram
    * (perplexity = e^xent).
    */
  def perplexity(s: SparkSession, d: String): DataFrame =
    score(Tables.documents(s, d)).orderBy(col("doc_id"))

  /** `(doc_id, n_grams, b2, b1)` bucket frame — the shared tokenize +
    * single native digest pass.
    */
  private def buckets(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), TextSim.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"),
        (size(col("t")) - 1).cast("long").as("n_grams"),
        Md5Buckets.pairGrams(col("t"), B2).as("b2"),
        Md5Buckets.salted(col("t"), "", B1).as("b1"))

  /** INCREMENTAL LM counts over a reference corpus: `(kind, b, c)`
    * rows (kind 1 = unigram context, 2 = bigram), ≤ B1+B2 of them —
    * raw counts only, so batches MERGE BY ADDITION
    * ([[graft.operators.Relevance.bm25Stats]]'s contract applied to
    * the LM): refreshing the reference model after an ingest batch
    * never rescans old documents.
    */
  def refCounts(refDocs: DataFrame): DataFrame = {
    val b = buckets(refDocs)
    b.select(lit(2).as("kind"), explode(col("b2")).as("b"))
      .unionAll(b.select(lit(1).as("kind"),
        explode(slice(col("b1"), lit(1), size(col("b1")) - 1)).as("b")))
      .groupBy(col("kind"), col("b"))
      .agg(count(lit(1)).cast("long").as("c"))
  }

  /** Counts from a new reference batch fold in by addition — exact,
    * any order.
    */
  def mergeCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionAll(b).groupBy(col("kind"), col("b"))
      .agg(sum(col("c")).cast("long").as("c"))

  /** The two fixed-point log tables from a counts frame — each rounds
    * to micro-nats INDEPENDENTLY, so the per-gram term is an integer
    * subtraction, bit-equal on any engine. Bounded collect
    * (≤ B1+B2 rows) under the bounded-statistic contract.
    */
  def lambdaTables(counts: DataFrame): (Array[Long], Array[Long]) = {
    val rows = counts.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val lam2 = Array.tabulate(B2) { b =>
      math.floor(math.log((rows.getOrElse((2, b.toLong), 0L) + 1).toDouble) * 1e6 + 0.5).toLong
    }
    val lam1 = Array.tabulate(B1) { b =>
      math.floor(math.log((rows.getOrElse((1, b.toLong), 0L) + B2).toDouble) * 1e6 + 0.5).toLong
    }
    (lam1, lam2)
  }

  /** Score `docs` against a FIXED pair of log tables — the serving
    * face (and the streaming one: the tables are plain literals, so
    * [[graft.streaming.StreamingPerplexity]] reuses this verbatim on
    * a stream projection). Pure per-row fold, no shuffle.
    */
  def scoreWith(docs: DataFrame,
    lam1: Array[Long], lam2: Array[Long]): DataFrame = {
    val lut2 = array(lam2.toSeq.map(lit): _*)
    val lut1 = array(lam1.toSeq.map(lit): _*)
    buckets(docs)
      .select(col("doc_id"), col("n_grams"),
        aggregate(
          zip_with(col("b2"), slice(col("b1"), lit(1), size(col("b1")) - 1),
            (p, u) => element_at(lut1, (u + 1).cast("int")) -
              element_at(lut2, (p + 1).cast("int"))),
          lit(0L), (acc, x) => acc + x).as("xent_micro"))
      .withColumn("xent",
        TextSim.r6((col("xent_micro").cast("double") / 1000000.0) /
          col("n_grams")))
  }

  /** Frame-based [[perplexity]] over any `(doc_id, text)` corpus:
    * calibrate on the held-out slice, score the rest.
    */
  def score(docs: DataFrame): DataFrame = {
    val (lam1, lam2) = lambdaTables(
      refCounts(docs.filter(col("doc_id") % Corpus.EvalMod === 0)))
    scoreWith(docs.filter(col("doc_id") % Corpus.EvalMod =!= 0), lam1, lam2)
  }

  val perplexitySql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
       |  FROM documents
       |), grams AS (
       |  SELECT doc_id,
       |         ('0x' || substr(md5(t[i] || ' ' || t[i+1]), 1, 7))::BIGINT % $B2 AS b2,
       |         ('0x' || substr(md5(t[i]), 1, 7))::BIGINT % $B1 AS b1
       |  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
       |        FROM toks WHERE len(t) >= 2)
       |), c2 AS (
       |  SELECT b2 AS b, count(*)::BIGINT AS c FROM grams
       |  WHERE doc_id % ${Corpus.EvalMod} = 0 GROUP BY b2
       |), c1 AS (
       |  SELECT b1 AS b, count(*)::BIGINT AS c FROM grams
       |  WHERE doc_id % ${Corpus.EvalMod} = 0 GROUP BY b1
       |), lam AS (
       |  SELECT g.doc_id,
       |         floor(ln((coalesce(o.c, 0) + $B2)::DOUBLE) * 1000000.0 + 0.5)::BIGINT
       |         - floor(ln((coalesce(p.c, 0) + 1)::DOUBLE) * 1000000.0 + 0.5)::BIGINT AS x
       |  FROM grams g
       |  LEFT JOIN c2 p ON p.b = g.b2
       |  LEFT JOIN c1 o ON o.b = g.b1
       |  WHERE g.doc_id % ${Corpus.EvalMod} <> 0
       |)
       |SELECT doc_id, count(*)::BIGINT AS n_grams,
       |       sum(x)::BIGINT AS xent_micro,
       |       ${TextSim.r6Sql("(sum(x)::DOUBLE / 1000000.0) / count(*)")} AS xent
       |FROM lam
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin
}
