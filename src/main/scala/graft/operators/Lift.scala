package graft.operators

import graft.Tables
import graft.functions.TextSim
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Decile lift/gains table of the CMS duplication score against
  * exact-duplicate truth — the cross-operator VALIDATION the sketch
  * tier needs: `q_dup_score` certifies uniqueness (CMS never
  * undercounts) but its positive signal is only useful if high
  * scores actually concentrate real duplicates. Score the
  * dup-injected corpus, rank into score deciles (top decile =
  * highest scores), and per decile report the duplicate rate,
  * cumulative capture, and lift over the base rate — the classic
  * model-evaluation gains chart, aimed at a detector the engine
  * itself built. A top-decile lift ≈ 1 would say the sketch ranks
  * noise; the fixture's injected exact-copy clusters must
  * concentrate in the top deciles (asserted).
  *
  * Determinism: truth is content-hash cluster membership (exact);
  * scores are the r6 dup_score fixed to the micro GRID; decile
  * assignment runs on the DESCENDING score-value grid — a tied value
  * block stays whole and lands in the decile of its LAST member
  * (⌊(cum−1)·10/n⌋ on BIGINT cumulatives, no doubles in the
  * decision); rates/capture/lift divide once each (r6).
  *
  * Scale shape: one scoring scan (the q_dup_score shape), one hash
  * fold for truth, an id-keyed join (bucket by doc at scale), then
  * everything runs on the ≤|score grid| value frame (the q_auc
  * discipline — no corpus-wide sort); the decile fold is ≤10 rows.
  */
object Lift {

  val Deciles = 10L

  def liftQuery(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.docsAug(s, d)
    val scored = DupScore.scoreWith(docs, DupScore.fitCorpus(docs))
      .select(col("doc_id"),
        floor(col("dup_score") * 1e6 + 0.5).cast("long").as("sm"))
    val truth = docs.select(col("doc_id"), md5(col("text")).as("h"))
    val dupIds = truth.join(
      truth.groupBy(col("h")).agg(count(lit(1)).as("nc")).filter(col("nc") > 1),
      "h").select(col("doc_id"), lit(1L).as("is_dup"))
    val base = scored.join(dupIds, Seq("doc_id"), "left")
      .withColumn("is_dup", coalesce(col("is_dup"), lit(0L)))
      .groupBy(col("sm"))
      .agg(count(lit(1)).cast("long").as("n"), sum(col("is_dup")).as("nd"))
    val w = graft.functions.GridWindow.ord(col("sm").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = base.agg(sum(col("n")).cast("long").as("n_all"),
      sum(col("nd")).cast("long").as("nd_all"))
    val dec = base
      .withColumn("cum", sum(col("n")).over(w))
      .crossJoin(broadcast(tot))
      .withColumn("decile",
        expr(s"least((cum - 1) * $Deciles div n_all, ${Deciles - 1})")
          .cast("long"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).cast("long").as("n_values"),
        sum(col("n")).cast("long").as("n_docs"),
        sum(col("nd")).cast("long").as("n_dup"),
        max(col("n_all")).as("n_all"), max(col("nd_all")).as("nd_all"))
    val wc = graft.functions.GridWindow.ord(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dec
      .withColumn("cum_dup", sum(col("n_dup")).over(wc))
      .select(col("decile"), col("n_docs"), col("n_dup"),
        when(col("nd_all") > 0,
          TextSim.r6(col("n_dup").cast("double") / col("n_docs").cast("double")))
          .as("dup_rate"),
        when(col("nd_all") > 0,
          TextSim.r6(col("cum_dup").cast("double") / col("nd_all").cast("double")))
          .as("capture"),
        when(col("nd_all") > 0,
          TextSim.r6((col("n_dup").cast("double") / col("n_docs").cast("double")) /
            (col("nd_all").cast("double") / col("n_all").cast("double"))))
          .as("lift"))
      .orderBy(col("decile"))
  }

  val liftSql: String =
    s"""WITH ${Tables.docsAugSql},
       |${DupScore.dupScoreCtesSql("docs_aug")},
       |scored AS (
       |  SELECT doc_id, CAST(floor(dup_score * 1000000.0 + 0.5) AS BIGINT) AS sm
       |  FROM ds_scores
       |), hashes AS (
       |  SELECT doc_id, md5(text) AS h FROM docs_aug
       |), dup_ids AS (
       |  SELECT doc_id, 1::BIGINT AS is_dup
       |  FROM hashes JOIN (SELECT h FROM hashes GROUP BY h HAVING count(*) > 1)
       |  USING (h)
       |), base AS (
       |  SELECT s.sm, count(*)::BIGINT AS n,
       |         sum(coalesce(d.is_dup, 0))::BIGINT AS nd
       |  FROM scored s LEFT JOIN dup_ids d ON d.doc_id = s.doc_id
       |  GROUP BY s.sm
       |), tot AS (
       |  SELECT sum(n)::BIGINT AS n_all, sum(nd)::BIGINT AS nd_all FROM base
       |), dec AS (
       |  SELECT least((sum(n) OVER (ORDER BY sm DESC ROWS UNBOUNDED PRECEDING) - 1)
       |               * $Deciles // n_all, ${Deciles - 1})::BIGINT AS decile,
       |         n, nd, n_all, nd_all
       |  FROM base CROSS JOIN tot
       |), grp AS (
       |  SELECT decile, sum(n)::BIGINT AS n_docs, sum(nd)::BIGINT AS n_dup,
       |         max(n_all)::BIGINT AS n_all, max(nd_all)::BIGINT AS nd_all
       |  FROM dec GROUP BY decile
       |)
       |SELECT decile, n_docs, n_dup,
       |       CASE WHEN nd_all > 0 THEN
       |         ${TextSim.r6Sql("n_dup::DOUBLE / n_docs::DOUBLE")} END AS dup_rate,
       |       CASE WHEN nd_all > 0 THEN
       |         ${TextSim.r6Sql(
      "sum(n_dup) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)::DOUBLE / nd_all::DOUBLE")}
       |       END AS capture,
       |       CASE WHEN nd_all > 0 THEN
       |         ${TextSim.r6Sql(
      "(n_dup::DOUBLE / n_docs::DOUBLE) / (nd_all::DOUBLE / n_all::DOUBLE)")}
       |       END AS lift
       |FROM grp
       |ORDER BY decile""".stripMargin
}
