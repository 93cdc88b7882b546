package graft

import graft.operators.{OPQ, QualitySketch}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the two newest mergeable/metadata kernels.
  * (Raw scalacheck Gen with fixed seeds; the scalatest bridge artifact
  * isn't in the offline cache.)
  */
class SketchOpqPropertySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** QualitySketch.merge over ANY random (source, quality) multiset
    * split into ANY batch sequence equals the one-shot sketch —
    * including batches that miss whole sources, duplicate qualities on
    * bin edges, and single-row batches.
    */
  test("random batch splits: folded sketch merge == one-shot sketch") {
    (1 to 15).foreach { s =>
      val p = Gen.Parameters.default
      val len = Gen.chooseNum(1, 60).apply(p, Seed(s)).getOrElse(1)
      val rows = Gen.listOfN(len, for {
        src <- Gen.oneOf("a", "b", "c")
        // hit exact bin edges often: k/256 values stress floor/least
        q <- Gen.oneOf(Gen.chooseNum(0, 256).map(_ / 256.0),
          Gen.chooseNum(0.0, 1.0))
      } yield (src, q)).apply(p, Seed(s * 104729L)).getOrElse(Nil)
      val cuts = Gen.chooseNum(1, 4).apply(p, Seed(s * 7919L)).getOrElse(2)
      val sig = rows.zipWithIndex
        .map { case ((src, q), i) => (i.toLong, src, q) }
        .toDF("doc_id", "source", "quality")
      val whole = QualitySketch.fromSignals(sig)
        .as[(String, Int, Long)].collect().toSet
      val batches = rows.zipWithIndex.groupMap(_._2 % cuts)(x => x)
        .toSeq.sortBy(_._1).map(_._2.map { case ((src, q), i) =>
          (i.toLong, src, q) }.toDF("doc_id", "source", "quality"))
      val merged = batches.map(QualitySketch.fromSignals)
        .reduce(QualitySketch.merge)
        .as[(String, Int, Long)].collect().toSet
      assert(merged == whole, s"seed $s: merged sketch diverged")
    }
  }

  /** fitPermutation on ANY variance profile returns a bijection whose
    * per-subspace variance loads are balanced: no subspace's load
    * exceeds another's by more than the largest single variance (the
    * LPT-with-capacity guarantee).
    */
  test("random variance profiles: permutation is a balanced bijection") {
    val dim = 16
    val m = 4
    (1 to 15).foreach { s =>
      val p = Gen.Parameters.default
      val vars = Gen.listOfN(dim, Gen.chooseNum(0.0, 100.0))
        .apply(p, Seed(s * 31L)).getOrElse(Nil).toArray
      // build a tiny frame whose per-dim variance is EXACTLY ±sqrt(v):
      // two rows per dim value mirrored around 0 -> var = v
      val rows = Seq(
        (1L, vars.map(v => math.sqrt(v).toFloat)),
        (2L, vars.map(v => -math.sqrt(v).toFloat)))
      val df = rows.toDF("vec_id", "embedding")
      val perm = OPQ.fitPermutation(df, dim, m)
      assert(perm.sorted.toSeq == (0 until dim), s"seed $s: not a bijection")
      val loads = (0 until m).map(j =>
        perm.slice(j * dim / m, (j + 1) * dim / m).map(vars).sum)
      val maxVar = vars.max
      assert(loads.max - loads.min <= maxVar + 1e-6,
        s"seed $s: loads $loads spread exceeds max variance $maxVar")
    }
  }
}
