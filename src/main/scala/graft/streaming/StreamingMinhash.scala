package graft.streaming

import java.sql.Timestamp

import graft.functions.TextSim
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One LSH band observation on the stream. */
case class BandHit(bucket: String, doc_id: Long, ts: Timestamp)

/** Near-duplicate candidate pair (needs offline exact verify). */
case class CandPair(a_id: Long, b_id: Long, bucket: String)

/** Per-bucket state: resident doc ids, bounded. */
case class BucketState(docIds: List[Long], lastSeenMs: Long)

/** Streaming MinHash near-dup detection: the continuous twin of
  * `Dedup.minhash`. Signatures are the same per-row expressions as the
  * batch operator (HOFs run fine under Structured Streaming); LSH band
  * buckets become *keyed state*, so a new document is checked only
  * against prior residents of its own buckets — never the corpus.
  *
  * Emits candidate pairs (the LSH contract); exact-Jaccard verification
  * joins candidates against the shingle store offline, as in batch.
  *
  * State bounds, both essential at 100 TB/day: event-time TTL evicts
  * idle buckets, and `MaxBucket` caps residents per bucket — a viral
  * bucket (boilerplate page, near-empty doc) would otherwise grow its
  * state and pair output quadratically; past the cap, new arrivals
  * pair against the cap'd residents only (first-K semantics,
  * deterministic within arrival order).
  */
object StreamingMinhash {

  val MaxBucket = 16
  val TtlMs: Long = 6L * 3600 * 1000

  /** doc stream (doc_id, text, ts) → band-bucket hits using the batch
    * operator's exact signature pipeline.
    */
  def bandHits(docs: DataFrame): Dataset[BandHit] = {
    implicit val enc = Encoders.product[BandHit]
    val toks = docs
      .select(col("doc_id"), col("ts"), TextSim.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), col("ts"), TextSim.shingles3(col("t")).as("sh"))
      .withColumn("pairs", graft.functions.SigExprs.hashPairs(col("sh")))
      .withColumn("sig", TextSim.minhashSigFromPairs(col("pairs")))
    toks
      .select(col("doc_id"), col("ts"),
        explode(transform(sequence(lit(0), lit(TextSim.Bands - 1)), b =>
          concat_ws("_", b,
            concat_ws(":", slice(col("sig"), b * TextSim.RowsPerBand + 1,
              lit(TextSim.RowsPerBand)))))).as("bucket"))
      .as[BandHit]
  }

  def update(bucket: String, hits: Iterator[BandHit],
    state: GroupState[BucketState]): Iterator[CandPair] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val batch = hits.toSeq.sortBy(h => (h.ts.getTime, h.doc_id))
    if (batch.isEmpty) return Iterator.empty
    var st = state.getOption.getOrElse(BucketState(Nil, 0L))
    val out = List.newBuilder[CandPair]
    batch.foreach { h =>
      if (!st.docIds.contains(h.doc_id)) {
        st.docIds.foreach { prev =>
          out += CandPair(math.min(prev, h.doc_id), math.max(prev, h.doc_id), bucket)
        }
        if (st.docIds.size < MaxBucket)
          st = st.copy(docIds = st.docIds :+ h.doc_id)
      }
      st = st.copy(lastSeenMs = math.max(st.lastSeenMs, h.ts.getTime))
    }
    state.update(st)
    state.setTimeoutTimestamp(st.lastSeenMs + TtlMs)
    out.result().iterator
  }

  /** Full stream: docs → band hits → stateful bucket join → candidate
    * pairs (distinct-per-bucket; a pair colliding in k bands appears k
    * times — dedup downstream with the verify, exactly as in batch).
    */
  def candidates(docs: DataFrame): Dataset[CandPair] = {
    implicit val ce = Encoders.product[CandPair]
    implicit val se = Encoders.product[BucketState]
    implicit val ke = Encoders.STRING
    bandHits(docs)
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update _)
  }
}
