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

  /** Frame-based [[perplexity]] over any `(doc_id, text)` corpus. */
  def score(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), TextSim.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"),
        (size(col("t")) - 1).cast("long").as("n_grams"),
        Md5Buckets.pairGrams(col("t"), B2).as("b2"),
        Md5Buckets.salted(col("t"), "", B1).as("b1"))
    val ref = toks.filter(col("doc_id") % Corpus.EvalMod === 0)
    // reference counts: bigram occurrences, and unigram CONTEXT
    // occurrences (first n-1 positions — each bigram's left word)
    val c2 = ref.select(explode(col("b2")).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("c")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val c1 = ref.select(explode(slice(col("b1"), lit(1), size(col("b1")) - 1)).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("c")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each table rounds to micro-nats INDEPENDENTLY; the per-gram
    // term is then an integer subtraction — bit-equal on any engine
    val lam2: Array[Long] = Array.tabulate(B2) { b =>
      math.floor(math.log((c2.getOrElse(b.toLong, 0L) + 1).toDouble) * 1e6 + 0.5).toLong
    }
    val lam1: Array[Long] = Array.tabulate(B1) { b =>
      math.floor(math.log((c1.getOrElse(b.toLong, 0L) + B2).toDouble) * 1e6 + 0.5).toLong
    }
    val lut2 = array(lam2.toSeq.map(lit): _*)
    val lut1 = array(lam1.toSeq.map(lit): _*)
    toks.filter(col("doc_id") % Corpus.EvalMod =!= 0)
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
