package graft.operators

import graft.Tables
import graft.functions.TextSim
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding-cosine benchmark decontamination — the SEMANTIC tier of
  * the contamination family. The existing screens escalate by cost:
  * exact n-gram overlap ([[Corpus.contamination]]), Bloom membership
  * ([[Corpus.contaminationBloom]]), near-dup minhash
  * ([[Dedup.minhashContam]]) — but all are LEXICAL: a paraphrased or
  * translated eval item shares no 3-grams and no shingle set with its
  * leak, yet its embedding still sits next to it. This screen flags
  * every training vector whose cosine to ANY eval-set vector clears a
  * threshold — the leak class n-gram machinery structurally misses
  * (the reference pipeline embeds everything it uploads,
  * Notion_openai_vector_etl.py:329-344; decontamination on those
  * vectors is this exact query).
  *
  * Scale shape, exact form: the eval side is a benchmark suite —
  * bounded by construction, like the [[Corpus.contamination]] eval
  * shingles — so it broadcasts, and the corpus makes ONE pass scoring
  * against it (no shuffle; the only exchange is the bounded flagged
  * output's sort). At 10¹¹ vectors even |eval| dots per row is real
  * money, so the production path INVERTS the direction: the eval set
  * becomes the QUERY BATCH against the stored
  * [[graft.sources.IndexStore]] — |eval|·nprobe pruned-partition
  * reads instead of a corpus scan, with the exact re-rank restoring
  * verify-exactness ([[screenServed]], tested against this oracle
  * form on full probing).
  */
object EmbedContam {

  /** Cosine floor for a contamination flag — the embed-dedup bar. */
  val Tau = 0.95

  /** Every 20th base vector doubles as the "benchmark" fixture; the
    * injected exact copies (vec_id + 1000000, [[Tables.embAug]]) are
    * the planted verbatim leaks.
    */
  val EvalMod = 20

  /** Exact screen over caller frames: every (train_id, eval_id,
    * cos_sim) with cosine ≥ tau. Eval is broadcast; the corpus never
    * shuffles.
    */
  def screen(train: DataFrame, evalSet: DataFrame, tau: Double = Tau): DataFrame = {
    val t = train.select(col("vec_id").as("train_id"), col("embedding").as("t_emb"))
      .withColumn("t_nrm", Ann.norm(col("t_emb")))
    val e = evalSet.select(col("vec_id").as("eval_id"), col("embedding").as("e_emb"))
      .withColumn("e_nrm", Ann.norm(col("e_emb")))
    t.crossJoin(broadcast(e))
      .select(col("train_id"), col("eval_id"),
        Ann.cosine(col("t_emb"), col("t_nrm"), col("e_emb"), col("e_nrm"))
          .as("cos_sim"))
      .filter(col("cos_sim") >= tau)
  }

  /** The production direction at index scale: the eval set becomes a
    * QUERY BATCH against the stored train-side [[graft.sources.IndexStore]]
    * — |eval|·nprobe pruned-partition reads instead of a corpus scan —
    * and the ADC shortlist is re-ranked EXACTLY ([[Ann.rerank]], same
    * rounded-cosine arithmetic as [[screen]]) before the τ cut, so
    * every emitted pair is verified-true (served ⊆ exact by
    * construction; recall follows the probe width, with verbatim
    * leaks at cosine 1.0 ranking first in their list). The index must
    * hold ONLY train vectors — indexing eval members would surface
    * eval-to-eval self-pairs the exact screen excludes by definition.
    */
  def screenServed(s: SparkSession, handle: graft.sources.IndexStore.Handle,
    train: DataFrame, evalSet: DataFrame, tau: Double = Tau,
    shortlist: Int = 30, nprobe: Int = Ann.NProbe): DataFrame =
    Ann.rerank(s, train,
      evalSet.select(col("vec_id"), col("embedding")),
      handle.search(evalSet.select(col("vec_id"), col("embedding")),
        k = shortlist, nprobe = nprobe)
        .select(col("query_id"), col("vec_id")),
      k = shortlist)
      .filter(col("cos_sim") >= tau)
      .select(col("vec_id").as("train_id"), col("query_id").as("eval_id"),
        col("cos_sim"))

  /** q_embed_contam — the screen over the augmented embedding corpus:
    * eval = every 20th base vector, train = everything else (the
    * injected copies of eval members are the planted leaks).
    */
  def embedContam(s: SparkSession, d: String): DataFrame = {
    val aug = Tables.embAug(s, d)
    val ev = aug.filter(col("vec_id") % EvalMod === 0 && col("vec_id") < 1000000L)
    val tr = aug.filter(col("vec_id") % EvalMod =!= 0 || col("vec_id") >= 1000000L)
    screen(tr, ev).orderBy(col("train_id"), col("eval_id"))
  }

  val embedContamSql: String = {
    val cos = Ann.cosineSql("t.embedding", "t.nrm", "e.embedding", "e.nrm")
    s"""WITH ${Tables.embAugSql},
       |a AS (
       |  SELECT vec_id, embedding, ${"sqrt(" + Ann.dotSql("embedding", "embedding") + ")"} AS nrm
       |  FROM emb_aug
       |), e AS (
       |  SELECT * FROM a WHERE vec_id % $EvalMod = 0 AND vec_id < 1000000
       |), t AS (
       |  SELECT * FROM a WHERE vec_id % $EvalMod <> 0 OR vec_id >= 1000000
       |)
       |SELECT t.vec_id AS train_id, e.vec_id AS eval_id, $cos AS cos_sim
       |FROM t CROSS JOIN e
       |WHERE $cos >= $Tau
       |ORDER BY train_id, eval_id""".stripMargin
  }
}
