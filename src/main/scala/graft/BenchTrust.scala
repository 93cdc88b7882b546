package graft

/** Row-trust policy for [[Bench]] — pure functions, unit-tested in
  * BenchTrustSpec so the adjudication rules themselves sit under the
  * suite, not only under a judge replay (r7 finding: the r6
  * median-normalized window detector shipped 5 rows 2–3× inflated
  * with `retimed_n: 0` because a UNIFORMLY contended run raises the
  * run's own probe median — the detector's denominator — along with
  * every row).
  *
  * Three independent trust signals, each with its own failure mode:
  *  1. window contention (in [[Bench]]): bracketing probes > 2× the
  *     run's probe median — catches transient load windows, blind to
  *     uniform load;
  *  2. per-row variance: spread > 0.5× the kept min AND > 0.4 s
  *     absolute — a min-of-2 whose two runs disagreed by 2× is not a
  *     trustworthy number regardless of why (the absolute floor keeps
  *     sub-second queries' JIT jitter from tripping it: their error
  *     cannot move the metric line, while the r7 inflated rows
  *     carried multi-second spreads);
  *  3. cross-round drift vs the PERSISTED quiet constant
  *     (BASELINE_BENCH.json, committed at each round's quiet close):
  *     any row whose kept min runs > 1.5× its persisted quiet time
  *     (and > 0.3 s above it in absolute terms — sub-second rows'
  *     JIT jitter cannot move the metric line) is presumed inflated,
  *     UNCONDITIONALLY. The r8 driver run proved this must not gate
  *     on the global probe: a single-threaded sub-second probe barely
  *     feels a ~6-core background load that inflates 32-way-parallel
  *     queries 5–10× (probe 0.335 s vs 0.283 quiet = 1.18×, while
  *     q_trending shipped at 10× its quiet time unstamped). The probe
  *     gate still rides the calib line as a run-level diagnostic, but
  *     per-row baseline drift arms on the baseline row alone.
  * A suspect row is retimed once more (min-of-2, min with the earlier
  * measurement — every run is a full honest execution, so min never
  * understates); a row STILL suspect after the retime is stamped in
  * the metric line's `untrusted` list rather than riding it looking
  * clean.
  */
object BenchTrust {

  /** (quiet probe median, per-query quiet seconds) from a persisted
    * BASELINE_BENCH.json; (None, empty) when absent or unreadable —
    * the bench then runs on signals 1–2 alone, exactly as before the
    * baseline existed.
    */
  def readBaseline(path: String): (Option[Double], Map[String, Double]) =
    try {
      val p = java.nio.file.Paths.get(path)
      if (!java.nio.file.Files.exists(p)) (None, Map.empty)
      else parseBaseline(
        new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] baseline read failed: $e")
      (None, Map.empty)
    }

  /** Parse split out for testability (no filesystem). */
  private[graft] def parseBaseline(txt: String): (Option[Double], Map[String, Double]) = {
    val q = """"probe_median_s"\s*:\s*([0-9.eE+-]+)""".r
      .findFirstMatchIn(txt).map(_.group(1).toDouble)
    val ti = txt.indexOf("\"times\"")
    val times =
      if (ti < 0) Map.empty[String, Double]
      else {
        val open = txt.indexOf('{', ti)
        val close = txt.indexOf('}', open)
        """"([A-Za-z0-9_]+)"\s*:\s*([0-9.eE+-]+)""".r
          .findAllMatchIn(txt.substring(open, close + 1))
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      }
    (q, times)
  }

  /** Run-level contention DIAGNOSTIC (rides the calib line): this
    * run's probe median against the persisted quiet constant. Since
    * r9 this no longer gates signal 3 — the r8 artifact showed a
    * short single-threaded probe nearly blind to background load that
    * inflates 32-way-parallel queries — but an elevated probe median
    * is still the strongest run-level tell a reader has.
    */
  def globalContended(runProbeMedian: Double, baselineQuiet: Option[Double]): Boolean =
    baselineQuiet.exists(q => runProbeMedian > 2.0 * q)

  /** Signals 2–3 for one row. `baseTime` = the row's persisted quiet
    * seconds, when the baseline has it (a new query has none and is
    * judged on variance alone).
    *
    * Baseline CLEARANCE comes first: a row whose KEPT min sits at or
    * below 1.1× its persisted quiet time cannot be inflated — the
    * committed reference certifies the number, and a large spread
    * then only says the OTHER samples were slow (JIT/GC jitter),
    * which min-of-n already discarded. Without this, a quiet
    * back-to-back run stamps ~25 sub-2s rows whose shipped times are
    * FASTER than baseline (measured, r8 close) — conservatism that
    * noisy would train readers to ignore the stamp. The r7 inflated
    * rows shipped 2–3× their quiet times, so clearance never applies
    * to the failure class the stamp exists for (asserted in
    * BenchTrustSpec against the r7 replay).
    */
  def rowSuspect(t: Double, spread: Double,
    baseTime: Option[Double]): Boolean =
    if (baseTime.exists(b => t <= 1.1 * b)) false
    else (spread > 0.5 * t && spread > 0.4) ||
      baseTime.exists(b => t > 1.5 * b && t - b > 0.3)

  /** Tail-pass merge (r10, from the r9 brief): a row's FIRST retime
    * happens mid-sweep, while its neighbors' GC debt is still
    * settling — the r9 artifact stamped 12 rows that an immediate
    * quiet re-run all cleared at ≤1.42× baseline. So after the sweep
    * ends (load settled), every still-stamped row is re-timed once
    * more; this pure rule merges the tail measurement with the
    * mid-sweep one by keeping the WHOLE (time, spread) pair of the
    * faster run — never a min-of-each synthetic pair that no run
    * observed: min(time) is honest (every run is a full execution)
    * but min(spread) from the OTHER run is a stability number the
    * faster run didn't exhibit (r10 ADVICE). The stamp clears ONLY
    * if at least one run's ACTUAL pair passes [[rowSuspect]]
    * (i.e. it stays when both real measurements fail, in two load
    * regimes). Returns (time, spread, stillSuspect). A failed tail
    * run (`tailOk` false) changes nothing: the row keeps its
    * mid-sweep number and its stamp.
    */
  def tailMerge(t: Double, spread: Double, tTail: Double,
    spreadTail: Double, tailOk: Boolean,
    baseTime: Option[Double]): (Double, Double, Boolean) =
    if (!tailOk) (t, spread, true)
    else {
      val (tf, sf) = if (tTail < t) (tTail, spreadTail) else (t, spread)
      val still = rowSuspect(t, spread, baseTime) &&
        rowSuspect(tTail, spreadTail, baseTime)
      (tf, sf, still)
    }
}
