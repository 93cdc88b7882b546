package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's row-trust rules, replayed against the ACTUAL r7
  * artifact numbers: the uniformly-contended driver run (probe median
  * 0.357 s vs quiet 0.1 s, q_dedup_eval 12.12 s vs quiet 4.63 s) must
  * now flag exactly the inflated rows, and a quiet run must flag
  * nothing.
  */
class BenchTrustSpec extends AnyFunSuite {

  test("parseBaseline extracts the quiet constant and per-query times") {
    val json =
      """{"round": 8, "sf": "/root/testdata/sf0.1",
        | "probe_median_s": 0.104, "n_queries": 3, "total_s": 9.9,
        | "machine": {"cpus": 32, "platform": "Linux", "load_at_run": [0.5, 0.7]},
        | "times": {"q1_agg": 0.25, "q_dedup_eval": 4.63, "q_hits": 2.26}}""".stripMargin
    val (q, times) = BenchTrust.parseBaseline(json)
    assert(q.contains(0.104))
    assert(times == Map("q1_agg" -> 0.25, "q_dedup_eval" -> 4.63, "q_hits" -> 2.26))
  }

  test("parseBaseline is total on junk") {
    assert(BenchTrust.parseBaseline("") == (None, Map.empty))
    assert(BenchTrust.parseBaseline("{\"nope\": 1}") == (None, Map.empty))
  }

  test("r7 replay: uniform contention flags exactly the inflated rows") {
    // r7 driver artifact: probe median 0.357 vs builder quiet ~0.104
    val contended = BenchTrust.globalContended(0.357, Some(0.104))
    assert(contended, "a 3.4x probe median must mark the run contended")
    // the five rows the judge found inflated (driver s vs quiet s)
    val inflated = Seq(
      ("q_dedup_eval", 12.12, 4.63), ("q_para_dedup_fuzzy", 7.09, 2.57),
      ("q_assoc", 3.03, 0.93), ("q_neighborhood", 3.13, 1.68))
    inflated.foreach { case (n, driver, quiet) =>
      assert(BenchTrust.rowSuspect(driver, 0.1, contended, Some(quiet)),
        s"$n at ${driver}s vs quiet ${quiet}s must be suspect")
    }
    // honest rows of the same run (driver ~= quiet) pass
    Seq(("q_keywords", 0.98, 0.88), ("q_pagerank", 3.28, 3.28))
      .foreach { case (n, driver, quiet) =>
        assert(!BenchTrust.rowSuspect(driver, 0.05, contended, Some(quiet)),
          s"$n must not be suspect")
      }
  }

  test("spread rule: multi-second run-to-run variance flags, JIT jitter does not") {
    // r7 spread column tell: spread ~= min on the inflated rows
    assert(BenchTrust.rowSuspect(12.12, 7.5, globallyContended = false, None))
    // a 0.2 s query with 0.19 s spread is JIT noise, not contention
    assert(!BenchTrust.rowSuspect(0.237, 0.189, globallyContended = false, None))
    // quiet machine, stable times: nothing flags
    assert(!BenchTrust.rowSuspect(4.6, 0.2, globallyContended = false, Some(4.63)))
  }

  test("baseline clearance: a kept min at/below quiet is trusted despite jitter") {
    // measured at the r8 close: a quiet back-to-back run stamped ~25
    // sub-2s rows whose SHIPPED minima beat their own baselines —
    // the spread only says the discarded samples were slow
    assert(!BenchTrust.rowSuspect(0.93, 0.51, globallyContended = false,
      Some(1.16)), "min faster than baseline cannot be inflated")
    assert(!BenchTrust.rowSuspect(1.0, 0.9, globallyContended = true,
      Some(1.0)), "at-baseline min is certified even in a contended run")
    // clearance NEVER applies to the r7 failure class (2-3x quiet)
    assert(BenchTrust.rowSuspect(12.12, 12.0, globallyContended = true,
      Some(4.63)))
    // and a row above 1.1x baseline keeps the variance rule
    assert(BenchTrust.rowSuspect(2.0, 1.5, globallyContended = false,
      Some(1.0)))
  }

  test("no baseline: global contention undetectable, variance rule still live") {
    assert(!BenchTrust.globalContended(0.357, None))
    assert(BenchTrust.rowSuspect(10.0, 6.0, globallyContended = false, None))
  }

  test("new query without a baseline row is judged on variance alone") {
    assert(!BenchTrust.rowSuspect(3.0, 0.1, globallyContended = true, None))
    assert(BenchTrust.rowSuspect(3.0, 2.0, globallyContended = true, None))
  }
}
