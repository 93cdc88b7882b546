package graft

import graft.operators.Linkage
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LinkageSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private lazy val linked = Linkage.linkage(spark, sf)
    .persist()

  test("every unperturbed true pair is a match; perturbed names land in review") {
    val truePairs = linked.filter(col("b_id") === col("a_id") + 100000L)
    val n = Tables.customer(spark, sf).count()
    // every customer's registry twin shares the block (balance intact),
    // so every true pair survives candidate generation
    assert(truePairs.count() == n)
    val clean = truePairs.filter(col("a_id") % 5 =!= 0)
    assert(clean.filter(col("verdict") =!= "match").count() == 0,
      "a pair disagreeing on nothing stronger than nation/segment must clear the upper threshold")
    val mangled = truePairs.filter(col("a_id") % 5 === 0)
    assert(mangled.count() > 0)
    assert(mangled.filter(col("verdict") === "nonmatch").count() == 0,
      "name-mangled twins still carry the cents agreement — never dropped")
    assert(mangled.filter(col("a_name")).count() == 0)
  }

  test("cross pairs only surface on accidental cents collisions, never as certain matches with a name") {
    val cross = linked.filter(col("b_id") =!= col("a_id") + 100000L)
    // surviving the score floor without being the twin requires the
    // high-weight cents agreement (name can't agree across customers)
    assert(cross.filter(!col("a_cents")).count() == 0)
    assert(cross.filter(col("a_name")).count() == 0)
  }

  test("score is the exact micro-nat fold of the agreement vector") {
    val rows = linked.select("a_name", "a_cents", "a_nation", "a_seg", "score_micro")
      .as[(Boolean, Boolean, Boolean, Boolean, Long)].collect()
    val fs = Seq(Linkage.NameF, Linkage.CentsF, Linkage.NationF, Linkage.SegF)
    rows.foreach { case (n0, c0, na0, s0, got) =>
      val bits = Seq(n0, c0, na0, s0)
      val want = fs.zip(bits).map { case (f, b) => if (b) f.wAgree else f.wDisagree }.sum
      assert(got == want)
    }
  }

  test("pattern counts fold exactly and EM recovers planted parameters") {
    // synthesize exact pattern frequencies from a known 3-field model —
    // three conditionally-independent binary fields is the F-S
    // identifiability floor (2^3−1 = 7 free frequencies = 7 params);
    // with two fields the model is underdetermined and EM drifts
    val (pT, mT, uT) = (0.2, Array(0.9, 0.8, 0.85), Array(0.05, 0.3, 0.1))
    val N = 10000000L
    val patterns = for (b0 <- Seq(true, false); b1 <- Seq(true, false);
      b2 <- Seq(true, false)) yield {
      def pf(m: Array[Double]) =
        Seq(b0, b1, b2).zip(m).map { case (b, mi) => if (b) mi else 1 - mi }.product
      val frac = pT * pf(mT) + (1 - pT) * pf(uT)
      (Seq(b0, b1, b2), math.round(frac * N))
    }
    val (p, m, u) = Linkage.emFit(patterns, fields = 3, iters = 500)
    assert(math.abs(p - pT) < 0.01, s"p=$p")
    mT.indices.foreach { i =>
      assert(math.abs(m(i) - mT(i)) < 0.02, s"m=${m.toSeq}")
      assert(math.abs(u(i) - uT(i)) < 0.02, s"u=${u.toSeq}")
    }
  }

  test("patternCounts is the exact agreement histogram of the candidate frame") {
    val cand = Seq(
      (true, true, true, true), (true, true, true, true),
      (false, true, true, false), (false, false, false, false))
      .toDF("a_name", "a_cents", "a_nation", "a_seg")
    val got = Linkage.patternCounts(cand)
      .as[(Boolean, Boolean, Boolean, Boolean, Long)].collect().toSet
    assert(got == Set(
      (true, true, true, true, 2L),
      (false, true, true, false, 1L),
      (false, false, false, false, 1L)))
  }

  test("graded comparator rescues mangled-name twins into certain matches") {
    val fuzzy = Linkage.linkageFuzzy(spark, sf).persist()
    val twins = fuzzy.filter(col("b_id") === col("a_id") + 100000L)
    // a mangled name is Levenshtein 1 from its original — the 'close'
    // band — so with the cents agreement every single-perturbation twin
    // now clears the match threshold (binary linkage left them in
    // clerical review)
    val mangled = twins.filter(col("a_id") % 5 === 0)
    assert(mangled.count() > 0)
    assert(mangled.filter(col("name_lev") =!= 1).count() == 0)
    val singlePerturb = mangled
      .filter(col("a_id") % 7 =!= 0 && col("a_id") % 3 =!= 0)
    assert(singlePerturb.filter(col("verdict") =!= "match").count() == 0)
    // the binary form graded the same pairs 'possible'
    val binaryMangled = linked
      .filter(col("b_id") === col("a_id") + 100000L && col("a_id") % 5 === 0 &&
        col("a_id") % 7 =!= 0 && col("a_id") % 3 =!= 0)
    assert(binaryMangled.filter(col("verdict") === "match").count() == 0)
    fuzzy.unpersist()
  }

  test("mutual best match is one-to-one and keeps every clean twin") {
    import org.apache.spark.sql.functions.countDistinct
    val best = Linkage.linkageBest(spark, sf).persist()
    val n = best.count()
    assert(best.select(countDistinct(col("a_id"))).as[Long].head() == n)
    assert(best.select(countDistinct(col("b_id"))).as[Long].head() == n)
    // clean twins (no name mangle) always outrank any collision pair
    val clean = Tables.customer(spark, sf)
      .filter(col("c_custkey") % 5 =!= 0).count()
    val cleanKept = best.filter(
      col("b_id") === col("a_id") + 100000L && col("a_id") % 5 =!= 0).count()
    assert(cleanKept == clean)
    // no pair survives that beats a twin on one side only
    val scored = Linkage.linked(
      Linkage.houseSide(spark, sf), Linkage.registry(spark, sf))
    assert(n <= scored.count())
    best.unpersist()
  }

  test("candidate count is bounded per record: 10x corpus => ~10x candidates, even on one hot block") {
    // adversarial corpus: EVERY record shares one cents value (the
    // degenerate hot block where single-key blocking goes n²) and
    // names are sequential (name-key blocks of ≤10 per side). A
    // bounded generator must stay LINEAR: per-record candidates are
    // capped by the name-key block (≤10) + the sorted-neighborhood
    // budget (≤2·SnBudget+1 per side fan-out), independent of n.
    def sides(n: Int) = {
      val a = (1 to n).map(i => (i.toLong, f"Customer#$i%09d", i % 25L, "SEG", 555L))
        .toDF("a_id", "nm", "nat", "seg", "cents")
      val b = (1 to n).map(i => (i + 100000L, f"Customer#$i%09d", i % 25L, "SEG", 555L))
        .toDF("b_id", "b_name", "b_nation", "b_seg", "b_cents")
      (a, b)
    }
    val (a1, b1) = sides(100)
    val (a2, b2) = sides(1000)
    val c1 = Linkage.candidates(a1, b1).count()
    val c2 = Linkage.candidates(a2, b2).count()
    assert(c1 > 0)
    // strictly sub-quadratic: 10x records must cost <= ~12x candidates
    // (quadratic would be 100x)
    assert(c2 <= c1 * 12, s"c1=$c1 c2=$c2 — candidate growth is super-linear")
    // and per-record: no record meets more than the documented budget
    val perRecord = Linkage.candidates(a2, b2)
      .groupBy(col("a_id")).count()
      .agg(max(col("count"))).as[Long].head()
    assert(perRecord <= 10 + 3 * Linkage.SnBudget,
      s"a record met $perRecord candidates — budget breached")
  }

  test("candidate generation is a blocked equi-join: no nested loop in the plan") {
    val plan = linked.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      plan.linesIterator.take(30).mkString("\n"))
  }
}
