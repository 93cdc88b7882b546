package graft

import graft.operators.SliceOverlap
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SliceOverlapSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** Two synthetic element sets with an exactly known Jaccard. */
  private def slices(shared: Int, onlyA: Int, onlyB: Int) = {
    val a = (0 until shared).map(i => ("A", s"s$i")) ++
      (0 until onlyA).map(i => ("A", s"a$i"))
    val b = (0 until shared).map(i => ("B", s"s$i")) ++
      (0 until onlyB).map(i => ("B", s"b$i"))
    (a ++ b).toDF("key", "elem")
  }

  test("estimate tracks the exact Jaccard within sketch error") {
    for ((sh, oa, ob) <- Seq((500, 500, 500), (900, 100, 100), (50, 950, 950))) {
      val exact = sh.toDouble / (sh + oa + ob)
      val est = SliceOverlap.overlapPairs(
        SliceOverlap.signatures(slices(sh, oa, ob), "key", "elem"))
        .select(col("est_jaccard")).as[Double].head()
      assert(math.abs(est - exact) < 0.1,
        s"J=$exact estimated $est (shared=$sh)")
    }
  }

  test("disjoint slices estimate 0; identical slices estimate 1") {
    val dis = SliceOverlap.overlapPairs(
      SliceOverlap.signatures(slices(0, 400, 400), "key", "elem"))
      .select(col("est_jaccard")).as[Double].head()
    assert(dis == 0.0)
    val same = SliceOverlap.overlapPairs(
      SliceOverlap.signatures(slices(400, 0, 0), "key", "elem"))
      .select(col("est_jaccard")).as[Double].head()
    assert(same == 1.0)
  }

  test("containment is asymmetric: a subset scores 1 against its superset") {
    // A ⊂ B: contain_a = 1 exactly, jaccard ~ 0.3
    val out = SliceOverlap.overlapPairs(
      SliceOverlap.signatures(slices(300, 0, 700), "key", "elem"))
      .select(col("est_jaccard"), col("est_contain_a"), col("est_contain_b"))
      .as[(Double, Double, Double)].head()
    assert(out._2 == 1.0, s"subset containment must be exact: $out")
    assert(math.abs(out._1 - 0.3) < 0.1 && out._3 < out._2, s"$out")
  }

  test("signatures are bounded by k and duplicate-blind; merge ≡ one-shot") {
    val df = slices(300, 300, 300)
    val sig = SliceOverlap.signatures(df, "key", "elem", k = 64)
    val sizes = sig.groupBy("key").count().as[(String, Long)].collect().toMap
    assert(sizes.values.forall(_ == 64), s"signature sizes: $sizes")
    // replaying the whole frame changes nothing
    val replay = SliceOverlap.signatures(df.unionAll(df), "key", "elem", k = 64)
    assert(sig.exceptAll(replay).isEmpty && replay.exceptAll(sig).isEmpty)
    // merging two halves == sketching the union
    val h1 = df.filter(hash(col("elem")) % 2 === 0)
    val h2 = df.filter(hash(col("elem")) % 2 =!= 0)
    val merged = SliceOverlap.merge(
      SliceOverlap.signatures(h1, "key", "elem", k = 64),
      SliceOverlap.signatures(h2, "key", "elem", k = 64), k = 64)
    assert(merged.exceptAll(sig).isEmpty && sig.exceptAll(merged).isEmpty)
  }

  test("every unordered pair appears exactly once, keys ordered") {
    val df = Seq(("A", "x"), ("B", "x"), ("C", "y")).toDF("key", "elem")
    val out = SliceOverlap.overlapPairs(SliceOverlap.signatures(df, "key", "elem"))
      .select(col("source_a"), col("source_b")).as[(String, String)].collect()
    assert(out.toSet == Set(("A", "B"), ("A", "C"), ("B", "C")))
    assert(out.forall { case (a, b) => a < b })
  }
}
