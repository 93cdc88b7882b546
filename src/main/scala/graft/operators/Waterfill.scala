package graft.operators

import graft.Tables
import graft.functions.TextSim
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget waterfilling — budget-constrained domain allocation.
  * Given a training budget of T tokens and per-domain availability
  * n_d, spend the budget as UNIFORMLY as possible without upsampling:
  * allocate min(n_d, λ) with the waterline λ chosen so the budget is
  * exactly spent — small domains are kept whole, hot domains are
  * capped at the common waterline. This is the global-budget
  * generalization of [[Corpus.domainCap]]'s fixed per-domain cap and
  * the exact-allocation counterpart of [[Corpus.mixSample]]'s
  * expected-rate temperature curve: the answer to "I can afford 600 B
  * of these 1 T tokens — how many from each source?" with a proof the
  * spend is exact.
  *
  * Arithmetic is all-integer: λ* = max over cut positions i of
  * ⌊(T − prefix_i) / (D − i)⌋ — every candidate is budget-feasible
  * (Σ min(n_d, c_i) ≤ prefix_i + (D−i)·c_i ≤ T, since capping can
  * only cheapen the true cost), and the true waterline is the
  * candidate at its own cut, so the max IS λ*. The remainder
  * r = T − Σ min(n_d, λ*) (provably < the uncapped-domain count when
  * any domain is uncapped) tops up the r first uncapped domains in
  * source order by one token each — exact spend, deterministic on any
  * engine.
  *
  * Scale shape: the corpus folds ONCE to the ≤|domains| (source,
  * n_tokens) stats frame; everything after — prefix sums, candidate
  * max, remainder ranks — runs windows over that tiny frame, with the
  * three scalar statistics (T, λ*, r) riding 1-row broadcasts (the
  * [[Corpus.domainMix]] total rule). Sound to ~10⁶ domains; a
  * 10⁸-domain allocation would range-partition the prefix sums.
  */
object Waterfill {

  /** Budget as a fraction of total corpus tokens: 60%, in exact
    * integer arithmetic (T = total·6 div 10).
    */
  val BudgetNum = 6L
  val BudgetDen = 10L

  /** Allocation over a caller (source, n_tokens) frame. */
  def allocate(domains: DataFrame): DataFrame = {
    // integer `div`, never `/`: Spark's `/` on longs is DOUBLE division
    // and would lose exactness at corpus-scale token counts
    val totals = domains.agg(
      sum(col("n_tokens")).as("total"),
      count(lit(1)).as("d_cnt"))
      .select(expr(s"(total * $BudgetNum) div $BudgetDen").as("budget"),
        col("d_cnt"))
    val wOrd = graft.functions.GridWindow.ord(col("n_tokens"), col("source"))
    val ranked = domains.withColumn("i", row_number().over(wOrd))
      .withColumn("prefix", sum(col("n_tokens")).over(wOrd))
      .crossJoin(broadcast(totals))
      .withColumn("prefix_prev", col("prefix") - col("n_tokens"))
    // candidate waterline at each cut; nonneg numerators only, so
    // integer division is floor on both engines
    val lambda = ranked
      .filter(col("budget") >= col("prefix_prev"))
      .select(expr("(budget - prefix_prev) div (d_cnt - i + 1)").as("cand"))
      .agg(max(col("cand")).as("waterline"))
    val base = ranked.crossJoin(broadcast(lambda))
      .withColumn("alloc0", least(col("n_tokens"), col("waterline")))
    val spent = base.agg((max(col("budget")) - sum(col("alloc0")))
      .as("remainder"))
    base.crossJoin(broadcast(spent))
      .withColumn("uncap_rank",
        when(col("n_tokens") > col("waterline"),
          row_number().over(graft.functions.GridWindow.ord(
            (col("n_tokens") <= col("waterline")).cast("int"), col("source"))))
          .otherwise(lit(null)))
      .withColumn("alloc",
        col("alloc0") + when(col("n_tokens") > col("waterline") &&
          col("uncap_rank") <= col("remainder"), 1L).otherwise(0L))
      .select(col("source"), col("n_tokens"), col("alloc"),
        (col("n_tokens") > col("alloc")).as("capped"),
        TextSim.r6(col("alloc").cast("double") / col("budget")).as("budget_share"))
  }

  /** q_waterfill — [[allocate]] over the per-source token counts. */
  def waterfill(s: SparkSession, d: String): DataFrame = {
    // persist barrier on the ≤|domains| stats frame: allocate()'s
    // branches (budget, waterline, remainder) all re-read it — without
    // the barrier each branch re-folds the CORPUS (the [[Dedup]]
    // signature-table lesson applied to a stats frame)
    val perDomain = Tables.documents(s, d)
      .select(col("source"),
        size(TextSim.tokens(col("text"))).cast("long").as("n_toks"))
      .groupBy(col("source"))
      .agg(sum(col("n_toks")).as("n_tokens"))
      .persist()
    allocate(perDomain).orderBy(col("source"))
  }

  val waterfillSql: String =
    s"""WITH per_doc AS (
       |  SELECT source,
       |         len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT AS n_toks
       |  FROM documents
       |), dom AS (
       |  SELECT source, sum(n_toks)::BIGINT AS n_tokens
       |  FROM per_doc GROUP BY source
       |), tot AS (
       |  SELECT (sum(n_tokens)::BIGINT * $BudgetNum) // $BudgetDen AS budget,
       |         count(*)::BIGINT AS d_cnt
       |  FROM dom
       |), ranked AS (
       |  SELECT source, n_tokens,
       |         row_number() OVER (ORDER BY n_tokens, source) AS i,
       |         sum(n_tokens) OVER (ORDER BY n_tokens, source
       |                             ROWS UNBOUNDED PRECEDING) AS prefix
       |  FROM dom
       |), lam AS (
       |  SELECT max((budget - (prefix - n_tokens)) // (d_cnt - i + 1))::BIGINT
       |           AS waterline
       |  FROM ranked, tot
       |  WHERE budget >= prefix - n_tokens
       |), base AS (
       |  SELECT r.source, r.n_tokens,
       |         least(r.n_tokens, l.waterline)::BIGINT AS alloc0,
       |         l.waterline, t.budget
       |  FROM ranked r, lam l, tot t
       |), rem AS (
       |  SELECT (max(budget) - sum(alloc0))::BIGINT AS remainder FROM base
       |), topped AS (
       |  SELECT b.source, b.n_tokens, b.budget,
       |         b.alloc0 + (CASE WHEN b.n_tokens > b.waterline AND
       |             row_number() OVER (ORDER BY (b.n_tokens <= b.waterline), b.source)
       |               <= r.remainder
       |           THEN 1 ELSE 0 END) AS alloc
       |  FROM base b, rem r
       |)
       |SELECT source, n_tokens, alloc::BIGINT AS alloc,
       |       (n_tokens > alloc) AS capped,
       |       ${TextSim.r6Sql("alloc::DOUBLE / budget::DOUBLE")} AS budget_share
       |FROM topped
       |ORDER BY source""".stripMargin
}
