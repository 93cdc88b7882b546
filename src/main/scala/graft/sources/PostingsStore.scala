package graft.sources

import graft.functions.{Md5Buckets, Md5Kit, TextSim}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The STORED lexical index — the [[SignatureStore]]/[[IndexStore]]
  * pattern applied to keyword retrieval: postings are computed once
  * and written partitioned by a term hash-bucket, so a query reads
  * only its terms' buckets (a partition-pruned scan of ≤|terms|/nBkts
  * of storage) and scores BM25 from stored statistics — no corpus
  * pass, no recompute, arbitrary ad-hoc terms (where
  * [[graft.operators.Relevance.bm25]] is the one-pass form for a
  * FIXED term set).
  *
  * Layout under `path`:
  *   - `postings/` — `(term, doc_id, tf)` partitioned by
  *     `bkt = md5-bucket(term) % nBuckets` ([[Md5Buckets]]; the
  *     driver computes the same bucket per query term via
  *     [[Md5Kit.bucketOfString]] — same digest arithmetic by
  *     construction, which IS the pruning contract).
  *   - `doclens/` — `(doc_id, dl)`.
  *   - `stats/` — one row `(n_docs, dl_sum)`.
  *
  * Scale shape: build is one explode + one partial-agg groupBy on
  * (doc_id, term) (tf), then a by-bucket write. Search reads the
  * pruned buckets, derives per-term df by counting that term's
  * postings (exact — tf rows are unique per (doc, term)), broadcasts
  * the ≤|terms| df rows and the 1-row stats past the postings, and
  * the only shuffle keys on the MATCHING docs (docs sharing ≥1 query
  * term), never the corpus. At 100 TB the bucket count scales with
  * vocabulary so a bucket stays a few GB — the knob is `nBuckets`,
  * everything else is unchanged.
  */
object PostingsStore {

  val K1 = graft.operators.Relevance.K1
  val B = graft.operators.Relevance.B
  val DefaultBuckets = 64

  def build(docs: DataFrame, path: String,
    nBuckets: Int = DefaultBuckets): Unit = {
    val spark = docs.sparkSession
    val toks = docs
      .select(col("doc_id"), TextSim.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 1)
      .persist()
    toks
      .select(col("doc_id"), explode(col("t")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("long").as("tf"))
      .withColumn("bkt",
        element_at(Md5Buckets.salted(array(col("term")), "", nBuckets.toLong), 1))
      .write.mode("overwrite").partitionBy("bkt").parquet(s"$path/postings")
    toks.select(col("doc_id"), size(col("t")).cast("long").as("dl"))
      .write.mode("overwrite").parquet(s"$path/doclens")
    toks.agg(count(lit(1)).cast("long").as("n_docs"),
      sum(size(col("t"))).cast("long").as("dl_sum"))
      .write.mode("overwrite").parquet(s"$path/stats")
    toks.unpersist()
    // the bucket spec is part of the STORE, not a caller argument:
    // append/search read it back, so a mismatched count can't silently
    // route new postings into buckets pruning will never read (the
    // SignatureStore.append lesson, applied from the start)
    import spark.implicits._
    Seq(nBuckets).toDF("n_buckets")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  private def bucketsOf(spark: SparkSession, path: String): Int =
    spark.read.parquet(s"$path/meta").collect()(0).getInt(0)

  /** Incremental ingest — the [[SignatureStore.append]] contract for
    * the lexical index: a new batch's postings land in their term
    * buckets (a partitioned APPEND — old buckets' files are never
    * rewritten), doclens append, and the 1-row stats merge by
    * addition ([[graft.operators.Relevance.mergeBm25Stats]]'s raw-sum
    * principle). Old documents are never rescanned; df needs no
    * stored update at all because [[search]] derives it from the
    * postings it reads — append-only storage keeps it exact.
    *
    * Durability caveat: the stats row is read-merge-overwritten, so a
    * crash between the postings append and the stats write leaves
    * stats stale by one batch (scores drift by that batch's mass until
    * the next append; rankings are unaffected for queries not
    * straddling the batch). The [[IndexStore]] generation-pointer
    * treatment would close even that window; for a 2-long-row table
    * the recovery is `build` — rerun it if an ingest died mid-append.
    */
  def append(docs: DataFrame, path: String): Unit = {
    val spark = docs.sparkSession
    val nBuckets = bucketsOf(spark, path)
    val toks = docs
      .select(col("doc_id"), TextSim.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 1)
      .persist()
    toks
      .select(col("doc_id"), explode(col("t")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("long").as("tf"))
      .withColumn("bkt",
        element_at(Md5Buckets.salted(array(col("term")), "", nBuckets.toLong), 1))
      .write.mode("append").partitionBy("bkt").parquet(s"$path/postings")
    toks.select(col("doc_id"), size(col("t")).cast("long").as("dl"))
      .write.mode("append").parquet(s"$path/doclens")
    val merged = spark.read.parquet(s"$path/stats")
      .unionAll(toks.agg(count(lit(1)).cast("long").as("n_docs"),
        sum(size(col("t"))).cast("long").as("dl_sum")))
      .agg(sum(col("n_docs")).cast("long").as("n_docs"),
        sum(col("dl_sum")).cast("long").as("dl_sum"))
      .collect()(0)
    toks.unpersist()
    import spark.implicits._
    Seq((merged.getLong(0), merged.getLong(1))).toDF("n_docs", "dl_sum")
      .write.mode("overwrite").parquet(s"$path/stats")
  }

  /** BM25 top-k for ad-hoc `terms`: a partition-pruned postings read,
    * df derived from the read postings, the same idf/saturation
    * arithmetic as [[graft.operators.Relevance.bm25Score]]. Terms
    * absent from the corpus contribute nothing (df = 0 rows simply
    * never join). Returns `(doc_id, matched, score)` ranked
    * (score desc, doc_id) — a TakeOrdered partial top-k.
    */
  def search(spark: SparkSession, path: String, terms: Seq[String],
    k: Int = 10): DataFrame = {
    val nBuckets = bucketsOf(spark, path)
    val bkts = terms.map(t => Md5Kit.bucketOfString(t, nBuckets.toLong))
      .distinct.sorted
    val post = spark.read.parquet(s"$path/postings")
      .filter(col("bkt").isin(bkts.map(_.toInt): _*))
      .filter(col("term").isin(terms: _*))
    val df = post.groupBy(col("term"))
      .agg(count(lit(1)).cast("long").as("df"))
    val stats = spark.read.parquet(s"$path/stats")
    val dls = spark.read.parquet(s"$path/doclens")
    val avgdl = col("dl_sum").cast("double") / col("n_docs")
    val idf = log(lit(1.0) +
      ((col("n_docs") - col("df")).cast("double") + 0.5) /
        (col("df").cast("double") + 0.5))
    val denom = col("tf").cast("double") +
      ((col("dl").cast("double") / avgdl) * B + (1.0 - B)) * K1
    post
      .join(broadcast(df), "term")
      .join(dls, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        (idf * (col("tf").cast("double") * (K1 + 1.0)) / denom).as("c"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("matched"),
        TextSim.r6(sum(col("c"))).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
