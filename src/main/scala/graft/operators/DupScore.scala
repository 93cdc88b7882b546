package graft.operators

import graft.Tables
import graft.functions.{Cms, Md5Buckets, TextSim}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch-tier duplication scoring: how duplicated is each document's
  * content ACROSS the corpus, per doc, without any pair join — the
  * cheap screen in front of the exact dedup family. [[Dedup]] answers
  * "which pairs/groups are duplicates" at one-shuffle-plus-band-join
  * cost; this answers "which documents are MADE OF widely-repeated
  * shingles" (boilerplate mills, template farms, mirror spam) at
  * scan cost, using a [[Cms]] count-min sketch of corpus shingle
  * document-frequencies as the broadcast artifact.
  *
  * The score is the mean sketch-estimated document-frequency of the
  * doc's distinct 3-shingles: 1.0 ≈ all content unique to this doc;
  * k ≈ the doc's shingles each appear in ~k documents. Because CMS
  * never undercounts, the score is a guaranteed UPPER bound on true
  * mean df — a doc scoring ~1.0 is certified unique, the
  * contrapositive screen ([[graft.functions.Bloom]]'s no-false-
  * negative contract, in counting form).
  *
  * Scale shape: the sketch trains in one partial-agg pass folding to
  * depth × width counters (mergeable by addition — per-batch sketches
  * fold in, old corpus never rescanned); scoring is a pure per-row
  * fold against depth literal tables riding the scan. The corpus
  * never shuffles in either phase. Reference hook: the reference
  * skips re-embedding via exact content hash
  * (Notion_openai_vector_etl.py:178-189); this is the statistical
  * generalization that also catches NEAR-template mass duplication
  * the exact hash misses.
  */
object DupScore {

  /** Distinct 3-shingle frame `(doc_id, g)` — the q_contamination
    * tokenize + shingle convention.
    */
  private def shingled(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), TextSim.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), TextSim.shingles3(col("t")).as("g"))

  /** Train the corpus-df sketch — one pass, bounded artifact.
    *
    * The gram stream explodes IN the projection that shingles
    * (q_contamination's shape) rather than off a named array column:
    * exploding a separate `g` column lets InferFiltersFromGenerate +
    * predicate pushdown substitute the whole tokenize+shingle chain
    * into a pre-Generate Filter — evaluated interpreted, outside
    * whole-stage codegen, twice per row (measured 10× on this pass).
    */
  def fitCorpus(docs: DataFrame): Cms.Sketch =
    Cms.fit(
      docs.select(col("doc_id"), TextSim.tokens(col("text")).as("t"))
        .filter(size(col("t")) >= 3)
        .select(explode(TextSim.shingles3(col("t"))).as("g")),
      "g")

  /** Score any `(doc_id, text)` frame against a FIXED sketch — the
    * serving/streaming face: stateless projection, zero shuffle.
    */
  def scoreWith(docs: DataFrame, sketch: Cms.Sketch): DataFrame =
    shingled(docs)
      .select(col("doc_id"), size(col("g")).cast("long").as("n_shingles"),
        aggregate(Cms.estimates(col("g"), sketch), lit(0L), _ + _)
          .as("est_sum"))
      .withColumn("dup_score",
        TextSim.r6(col("est_sum").cast("double") / col("n_shingles")))

  /** q_dup_score — self-scoring the documents corpus: sketch its own
    * shingle dfs, then score every doc against them.
    */
  def dupScore(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    scoreWith(docs, fitCorpus(docs)).orderBy(col("doc_id"))
  }

  /** The CMS self-scoring chain over `rel(doc_id, text)`, ending in
    * `ds_scores(doc_id, n_shingles, est_sum, dup_score)` — ONE SQL
    * definition shared by q_dup_score and q_lift (the
    * qualityScoreCtesSql discipline).
    */
  def dupScoreCtesSql(rel: String): String = {
    // row r of the sketch reads hex window [7r+1, 7r+7] of ONE digest
    // (Md5Kit.multiBuckets)
    def bSql(r: Int, g: String): String =
      s"('0x' || substr(md5($g), ${7 * r + 1}, 7))::BIGINT % ${Cms.Width}"
    val cnts = (0 until Cms.Depth).map { r =>
      s"c$r AS (SELECT ${bSql(r, "g")} AS b, count(*)::BIGINT AS c FROM sh GROUP BY 1)"
    }.mkString(", ")
    val joins = (0 until Cms.Depth).map { r =>
      s"JOIN c$r ON c$r.b = ${bSql(r, "sh.g")}"
    }.mkString(" ")
    val leastOf = (0 until Cms.Depth).map(r => s"c$r.c").mkString(", ")
    s"""toks AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
       |  FROM $rel
       |), sh AS (
       |  SELECT doc_id, unnest(${TextSim.shingles3Sql("t")}) AS g
       |  FROM toks WHERE len(t) >= 3
       |), $cnts, est AS (
       |  SELECT sh.doc_id, least($leastOf) AS e
       |  FROM sh $joins
       |), ds_scores AS (
       |  SELECT doc_id, count(*)::BIGINT AS n_shingles,
       |         sum(e)::BIGINT AS est_sum,
       |         ${TextSim.r6Sql("sum(e)::DOUBLE / count(*)")} AS dup_score
       |  FROM est GROUP BY doc_id
       |)""".stripMargin
  }

  val dupScoreSql: String =
    s"""WITH ${dupScoreCtesSql("documents")}
       |SELECT doc_id, n_shingles, est_sum, dup_score
       |FROM ds_scores
       |ORDER BY doc_id""".stripMargin

  /** q_cms_census — hash-pin the sketch ARTIFACT itself (q_dup_score
    * pins fit+estimate through the scores; this pins the counter
    * tables and the MERGE face): per sketch row r, the nonzero-bucket
    * count, counter mass (= corpus shingle count, every row sees every
    * occurrence), and max counter, all recomputed independently by the
    * oracle from the md5-window definition; plus `merge_mismatch`
    * pinned at exact 0 — per-source sketches (fit in ONE grouped pass,
    * `source × r × b` is a bounded statistic) folded through
    * [[Cms.Sketch.merge]] must equal the direct corpus fit elementwise,
    * the incremental contract (per-batch sketches sum to the corpus
    * artifact, old batches never rescanned) as a constant-pinned
    * column. A merge that lost a counter, a grouped fit that dropped a
    * source, or a drifted hash window all land in the hash.
    */
  /** Per-source counter rows `(source, r, b, c)` — ONE grouped pass,
    * ≤ |sources|·depth·width rows (bounded statistic). Exposed for the
    * ExplainAudit plan pin: a partial-agg groupBy riding the scan, no
    * join anywhere.
    */
  def cmsBySourceCounters(docs: DataFrame): DataFrame = docs
    .select(col("source"), TextSim.tokens(col("text")).as("t"))
    .filter(size(col("t")) >= 3)
    .select(col("source"), explode(TextSim.shingles3(col("t"))).as("g"))
    .select(col("source"), posexplode(
      Md5Buckets.multi(array(col("g")), Cms.Width, Cms.Depth))
      .as(Seq("r", "b")))
    .groupBy(col("source"), col("r"), col("b"))
    .agg(count(lit(1)).cast("long").as("c"))

  def cmsCensus(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val direct = fitCorpus(docs)
    val bySource = cmsBySourceCounters(docs).collect()
    val merged = bySource.groupBy(_.getString(0)).values.map { rs =>
      val counters = Array.fill(Cms.Depth)(new Array[Long](Cms.Width.toInt))
      rs.foreach(r => counters(r.getInt(1))(r.getLong(2).toInt) = r.getLong(3))
      Cms.Sketch(Cms.Depth, Cms.Width, counters, counters(0).sum)
    }.reduce(_ merge _)
    val rows = (0 until Cms.Depth).map { r =>
      val dr = direct.rows(r); val mr = merged.rows(r)
      (r.toLong, dr.count(_ != 0L).toLong, dr.sum, dr.max,
        dr.indices.count(i => dr(i) != mr(i)).toLong)
    }
    import s.implicits._
    rows.toDF("r", "nonzero", "row_sum", "row_max", "merge_mismatch")
      .orderBy(col("r"))
  }

  val cmsCensusSql: String = {
    val width = Cms.Width
    s"""WITH toks AS (
       |  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS t
       |  FROM documents
       |), sh AS (
       |  SELECT unnest(${TextSim.shingles3Sql("t")}) AS g
       |  FROM toks WHERE len(t) >= 3
       |), buckets AS (
       |  SELECT r, ('0x' || substr(md5(g), 7 * r + 1, 7))::BIGINT % $width AS b,
       |         count(*)::BIGINT AS c
       |  FROM sh, (SELECT unnest([0, 1, 2, 3]) AS r)
       |  GROUP BY 1, 2
       |)
       |SELECT r::BIGINT AS r, count(*)::BIGINT AS nonzero,
       |       sum(c)::BIGINT AS row_sum, max(c)::BIGINT AS row_max,
       |       0::BIGINT AS merge_mismatch
       |FROM buckets GROUP BY r ORDER BY r""".stripMargin
  }
}
