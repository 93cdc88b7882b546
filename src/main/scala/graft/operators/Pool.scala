package graft.operators

import graft.Tables
import graft.functions.TextSim
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding pooling — the chunk→document (or member→class) embedding
  * aggregation every retrieval corpus eventually needs: the reference
  * embeds CHUNKS (Notion_openai_vector_etl.py:309-344), but semantic
  * dedup, clustering, and mixing want one vector per document; the
  * standard answer is the mean of member embeddings.
  *
  * Determinism: a naive `avg(float)` folds in partition order and
  * diverges from any oracle in the last ulps. Here each component is
  * fixed to integer MICRO units FIRST (floor(v·1e6 + 0.5) — exact for
  * unit-scale floats), so the per-group sum is long arithmetic —
  * order-independent, hash-oracle-safe (the q_dsir rule applied to
  * vector space).
  *
  * Scale shape: one posexplode (×dim rows, no wider than the vectors
  * themselves) into ONE partial-agg groupBy on (key, dim) — map-side
  * combine does the heavy lifting, the shuffle carries ≤ |keys|·dim
  * aggregated rows per partition. [[pooledVectors]] re-assembles
  * arrays with the collect-sort-transform idiom ([[KMeansVec.fit]]'s
  * centroid pattern) — group cardinality = dim, bounded.
  */
object Pool {

  /** Per-(key, dim) mean in micro fixed point: `(k, dim, n_vecs,
    * mean)` — the flat, oracle-comparable form.
    */
  def meanPool(vectors: DataFrame, keyCol: String): DataFrame =
    vectors
      .select(col(keyCol).cast("long").as("k"),
        posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("k"), col("dim"),
        floor(col("v").cast("double") * 1e6 + 0.5).cast("long").as("vm"))
      .groupBy(col("k"), col("dim"))
      .agg(count(lit(1)).cast("long").as("n_vecs"),
        sum(col("vm")).cast("long").as("sum_micro"))
      .select(col("k"), col("dim").cast("long").as("dim"), col("n_vecs"),
        TextSim.r6(col("sum_micro").cast("double") / 1e6 / col("n_vecs"))
          .as("mean"))

  /** Pooled `(vec_id, embedding)` frame — the library face feeding
    * [[SemDedup.dedup]] / [[Ann.topKNeighbors]] with one vector per
    * key. Mean components are the micro-exact means of [[meanPool]],
    * reassembled in dim order.
    */
  def pooledVectors(vectors: DataFrame, keyCol: String): DataFrame =
    meanPool(vectors, keyCol)
      .groupBy(col("k"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("mean")))),
        s => s("mean").cast("float")).as("embedding"))
      .select(col("k").as("vec_id"), col("embedding"))

  /** q_pool_embed — [[meanPool]] of the embedding corpus by its class
    * `label` (the member→class pooling shape; chunk→doc is the same
    * code with a doc key).
    */
  def poolEmbed(s: SparkSession, d: String): DataFrame =
    meanPool(Tables.embeddings(s, d), "label")
      .withColumnRenamed("k", "label")
      .orderBy(col("label"), col("dim"))

  val poolEmbedSql: String =
    s"""WITH ex AS (
       |  SELECT label::BIGINT AS label,
       |         unnest(range(1, len(embedding) + 1)) - 1 AS dim,
       |         unnest(embedding) AS v
       |  FROM embeddings
       |), micro AS (
       |  SELECT label, dim, floor(v::DOUBLE * 1000000.0 + 0.5)::BIGINT AS vm
       |  FROM ex
       |)
       |SELECT label, dim::BIGINT AS dim, count(*)::BIGINT AS n_vecs,
       |       ${TextSim.r6Sql("sum(vm)::DOUBLE / 1000000.0 / count(*)")} AS mean
       |FROM micro GROUP BY label, dim
       |ORDER BY label, dim""".stripMargin
}
