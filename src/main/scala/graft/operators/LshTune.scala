package graft.operators

/** LSH banding auto-tuner — derive (bands, rowsPerBand) from a target
  * similarity threshold instead of hand-picking. For MinHash LSH with
  * b bands of r rows, a pair at Jaccard s collides with probability
  * P(s) = 1 − (1 − s^r)^b — an S-curve; the right banding makes that
  * curve hug the ideal step at the dedup threshold τ, so pairs above τ
  * are (almost) always candidates and pairs below (almost) never are.
  * This is the datasketch/Mining-Massive-Datasets tuning recipe as a
  * deterministic driver-side function: enumerate every (b, r) with
  * b·r ≤ signature length and minimize the integrated |P − step_τ|,
  * weighing false positives vs false negatives.
  *
  * Pure driver-side arithmetic over ≤ a few hundred divisor pairs —
  * nothing ships to tasks; the chosen banding parameterizes
  * [[Dedup.minhashPairs]]-family detectors. `fpWeight` prices a false
  * positive relative to a false negative: in a verify-exact pipeline
  * an FP costs one Jaccard check while an FN is a permanently-missed
  * duplicate, so production tuning discounts FP mass — which pushes
  * the effective threshold BELOW τ (recall-biased banding; the house
  * 16×4 default's effective threshold of 0.52 against a 0.8 verify
  * bar is this trade taken to its candidate-budget limit, asserted
  * directionally in LshTuneSpec).
  */
object LshTune {

  /** Collision probability of a pair at similarity `s`. */
  def pCollide(s: Double, b: Int, r: Int): Double =
    1.0 - math.pow(1.0 - math.pow(s, r), b)

  /** Integrated error of the S-curve against the ideal step at `tau`:
    * ∫₀^τ P (false-positive mass, weighted `fpWeight`) +
    * ∫_τ^1 (1 − P) (false-negative mass). Midpoint rule, `grid`
    * points.
    */
  def curveError(b: Int, r: Int, tau: Double, fpWeight: Double = 1.0,
    grid: Int = 1000): Double = {
    var err = 0.0
    var i = 0
    while (i < grid) {
      val s = (i + 0.5) / grid
      val p = pCollide(s, b, r)
      err += (if (s < tau) fpWeight * p else 1.0 - p) / grid
      i += 1
    }
    err
  }

  /** The (bands, rowsPerBand) minimizing [[curveError]] over every
    * pair with b·r ≤ `sigLen` (deterministic ties: fewer bands, then
    * smaller r — cheaper index first).
    */
  def tune(sigLen: Int, tau: Double, fpWeight: Double = 1.0): (Int, Int) = {
    val cands = for {
      r <- 1 to sigLen
      b <- 1 to sigLen / r
    } yield (b, r)
    cands.minBy { case (b, r) => (curveError(b, r, tau, fpWeight), b, r) }
  }

  /** The similarity at which the curve crosses 1/2 — the banding's
    * effective threshold, ≈ (1/b)^(1/r).
    */
  def effectiveThreshold(b: Int, r: Int): Double =
    math.pow(1.0 / b, 1.0 / r)
}
