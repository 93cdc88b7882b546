package graft.operators

import graft.functions.TextSim
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE tokenizer TRAINING — the iterative loop whose single first
  * round is [[TextAnalysis.bpeMerges]] (q_bpe_merges): each round
  * counts corpus-weighted adjacent symbol pairs, folds the top pair
  * into the symbol inventory, and re-segments — the learning face of
  * the tokenizer whose cost [[TextAnalysis.fertility]] measures
  * (re-expressing the tokenization the reference delegates to its
  * embedding API, `Notion_openai_vector_etl.py:329-344`).
  *
  * Scale shape (the part that matters at 100 TB): the corpus is
  * touched EXACTLY ONCE — one explode + one partial-agg groupBy folds
  * it to the `(word, tf)` vocabulary, after which every training
  * round runs over the |vocab|-sized symbol table: pair enumeration
  * explodes |vocab| rows, the winner is a TakeOrdered top-1, and the
  * re-segmentation is a per-row array fold. Rounds never rescan or
  * reshuffle documents. Each round's vocab is materialized through
  * [[Iterate.materialize]] (the BFS/Lloyd lineage rule: N rounds of
  * stacked higher-order functions would otherwise re-inline into one
  * unplannable expression tree — the q_cdc lesson).
  */
object Bpe {

  /** `(syms, tf)` — each distinct corpus word as its character-symbol
    * sequence, weighted by corpus frequency. Words of one character
    * carry no pairs and are dropped (matching
    * [[TextAnalysis.bpeMerges]]'s vocabulary).
    */
  def initVocab(docs: DataFrame): DataFrame =
    docs.select(explode(TextSim.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).cast("long").as("tf"))
      .filter(length(col("w")) >= 2)
      .select(transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1))).as("syms"), col("tf"))

  /** Adjacent-pair counts over a `(syms, tf)` frame — overlapping
    * occurrences count individually, exactly as the sequential BPE
    * `get_stats` does.
    */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      // fully-merged single-symbol words carry no pairs — and must be
      // dropped BEFORE the sequence() enumeration: sequence(1, 0)
      // counts DOWN in Spark, so it would probe past the array
      .filter(size(col("syms")) >= 2)
      .select(col("tf"), explode(transform(
        sequence(lit(1), size(col("syms")) - 1),
        i => struct(element_at(col("syms"), i).as("a"),
          element_at(col("syms"), (i + 1).cast("int")).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("tf")).cast("long").as("n"))

  /** Greedy left-to-right merge of adjacent `(a, b)` into the single
    * symbol `a+b` within one symbol array — the standard BPE
    * re-segmentation semantics: a freshly merged symbol is not
    * re-merged with the following element in the same pass, so
    * `aaaa` under `(a,a)` becomes `[aa, aa]`, not `[aaa, a]`.
    */
  private def mergeFold(syms: Column, a: String, b: String): Column = {
    val merged = a + b
    aggregate(syms,
      array().cast("array<string>"),
      (acc, x) => when(
        size(acc) >= 1 && element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
        .otherwise(concat(acc, array(x))))
  }

  /** Train `rounds` merges. Returns the merge table
    * `(rank, left, right, merged, n)` in learned order — the artifact
    * a tokenizer ships. Stops early if no pair remains (every word
    * fully merged). `checkpointDir` as in [[Crawl.bfs]]: reliable
    * checkpointing for cluster runs, `localCheckpoint` locally.
    */
  def train(docs: DataFrame, rounds: Int,
    checkpointDir: Option[String] = None): DataFrame = {
    val spark = docs.sparkSession
    var vocab = Iterate.materialize(initVocab(docs), checkpointDir)
    var merges = Vector.empty[(Int, String, String, String, Long)]
    var done = false
    var r = 0
    while (r < rounds && !done) {
      // top-1 pair: ties broken (n desc, a, b) — deterministic
      val top = pairCounts(vocab)
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (a, b, n) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges :+= ((r + 1, a, b, a + b, n))
        val prev = vocab
        vocab = Iterate.materialize(
          vocab.select(mergeFold(col("syms"), a, b).as("syms"), col("tf")),
          checkpointDir)
        prev.unpersist()
      }
      r += 1
    }
    import spark.implicits._
    merges.toDF("rank", "left", "right", "merged", "n")
  }

  /** The trained segmentation itself: apply an ordered merge table to
    * a fresh `(syms, tf)` vocabulary — how a shipped tokenizer
    * re-tokenizes NEW text with the learned inventory. Per-row folds,
    * no shuffle; materialized every `block` merges so a long merge
    * table can't re-inline into one unplannable HOF tree (the q_cdc
    * lesson again — stacked `aggregate` calls are the exact shape
    * that blew up there).
    */
  def segment(vocab: DataFrame, merges: Seq[(String, String)],
    checkpointDir: Option[String] = None, block: Int = 8): DataFrame =
    merges.grouped(block).foldLeft(vocab) { (v0, grp) =>
      Iterate.materialize(
        grp.foldLeft(v0) { case (v, (a, b)) =>
          v.select(mergeFold(col("syms"), a, b).as("syms"), col("tf"))
        }, checkpointDir)
    }
}
