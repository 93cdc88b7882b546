package graft.operators

import graft.Tables
import graft.functions.TextSim
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact ROC-AUC via the Mann–Whitney U statistic — the
  * ranking-quality readout of the evaluation family: `q_nb_calibration`
  * asks "is the margin honest about accuracy", this asks "how much
  * does a SCALAR know about a CLASS" — AUC(signal, class) = the
  * probability a random in-class doc outranks a random out-of-class
  * doc under the signal. Run one-vs-rest per source over the quality
  * composite: a source whose AUC ≈ ½ is indistinguishable from the
  * corpus by quality alone (filtering by quality won't skew the mix);
  * AUC far from ½ means quality thresholds double as source filters —
  * exactly what `q_filter_domain`'s per-source cutoffs exist to
  * correct.
  *
  * Exactness: AUC is computed as the RATIONAL
  * (ΣR₂ − n₁(n₁+1)) / (2·n₁·n₀) with ΣR₂ the doubled midrank sum —
  * midrank2(v) = 2·#{score < v} + #{score = v} + 1 is an integer, so
  * ties cost no fractions and every fold is a BIGINT; one r6 division
  * at the end. No sampling, no sort of the corpus by score on both
  * engines to drift.
  *
  * Scale shape: scores fix to the micro GRID, so the ranking window
  * runs over ≤1e6+1 DISTINCT score values — bounded by the grid, not
  * the corpus (the reason to rank the grid, not the rows: a per-row
  * global sort at 10¹¹ docs is the thing this formulation deletes).
  * One corpus fold to (score, cnt) + one to (source, score, cnt_pos);
  * per-source AUC folds the ≤|sources|·|grid| join map-side. An empty
  * class side reports NULL (guard).
  */
object Auc {

  /** Per-source one-vs-rest AUC of the quality composite:
    * `(source, n_pos, n_neg, auc)`.
    */
  def aucQuery(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    // barrier: the quality-composite scan feeds the global grid, the
    // per-source grid and the total — unpersisted it re-derives the
    // corpus score three times (the Conformal discipline)
    val scored = TextAnalysis.qualityScoresOf(docs)
      .select(col("doc_id"),
        floor(col("quality") * 1e6 + 0.5).cast("long").as("sm"))
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .persist()
    val byVal = scored.groupBy(col("sm"))
      .agg(count(lit(1)).cast("long").as("cnt"))
    val w = graft.functions.GridWindow.ord(col("sm"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = byVal
      .withColumn("c_le", sum(col("cnt")).over(w))
      .select(col("sm"),
        (lit(2L) * (col("c_le") - col("cnt")) + col("cnt") + 1L).as("mr2"))
    val pos = scored.groupBy(col("source"), col("sm"))
      .agg(count(lit(1)).cast("long").as("c_pos"))
    // the total is free off the grid — never a third corpus pass
    val tot = byVal.agg(sum(col("cnt")).cast("long").as("n_all"))
    pos.join(ranked, "sm")
      .groupBy(col("source"))
      .agg(sum(col("c_pos")).cast("long").as("n_pos"),
        sum(col("c_pos") * col("mr2")).cast("long").as("sr2"))
      .crossJoin(broadcast(tot))
      .select(col("source"), col("n_pos"),
        (col("n_all") - col("n_pos")).as("n_neg"),
        when(col("n_pos") > 0 && col("n_all") > col("n_pos"),
          TextSim.r6(
            (col("sr2") - col("n_pos") * (col("n_pos") + 1L)).cast("double") /
              (lit(2.0) * col("n_pos").cast("double") *
                (col("n_all") - col("n_pos")).cast("double")))).as("auc"))
      .orderBy(col("source"))
  }

  val aucSql: String =
    s"""WITH ${TextAnalysis.qualityScoreCtesSql("documents")},
       |scored AS (
       |  SELECT q.doc_id, d.source,
       |         CAST(floor(q.quality * 1000000.0 + 0.5) AS BIGINT) AS sm
       |  FROM q_scores q JOIN documents d ON d.doc_id = q.doc_id
       |), by_val AS (
       |  SELECT sm, count(*)::BIGINT AS cnt FROM scored GROUP BY sm
       |), ranked AS (
       |  SELECT sm,
       |         (2 * (sum(cnt) OVER (ORDER BY sm ROWS UNBOUNDED PRECEDING) - cnt)
       |          + cnt + 1)::BIGINT AS mr2
       |  FROM by_val
       |), pos AS (
       |  SELECT source, sm, count(*)::BIGINT AS c_pos
       |  FROM scored GROUP BY source, sm
       |), tot AS (
       |  SELECT count(*)::BIGINT AS n_all FROM scored
       |), agg AS (
       |  SELECT p.source, sum(p.c_pos)::BIGINT AS n_pos,
       |         sum(p.c_pos * r.mr2)::BIGINT AS sr2
       |  FROM pos p JOIN ranked r ON r.sm = p.sm
       |  GROUP BY p.source
       |)
       |SELECT source, n_pos, (n_all - n_pos)::BIGINT AS n_neg,
       |       CASE WHEN n_pos > 0 AND n_all > n_pos THEN
       |         ${TextSim.r6Sql(
      "(sr2 - n_pos * (n_pos + 1))::DOUBLE / (2.0::DOUBLE * n_pos::DOUBLE * (n_all - n_pos)::DOUBLE)")}
       |       END AS auc
       |FROM agg CROSS JOIN tot
       |ORDER BY source""".stripMargin
}
