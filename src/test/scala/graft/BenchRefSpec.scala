package graft

import org.scalatest.funsuite.AnyFunSuite

/** The deviation-reference update gate ([[Bench.refDecision]]) — the
  * structural end of the recurring "re-pin the calm bench reference"
  * verdict item: only a complete, calm-window run may replace the
  * committed BENCH_FULL.json. */
class BenchRefSpec extends AnyFunSuite {

  test("only complete calm runs replace the reference") {
    // calm + complete → written
    assert(Bench.refDecision(subset = false, nFailed = 0,
      load0 = 0.4, stealPct = 0.1, force = false) === "written")
    // subset runs never do, however calm
    assert(Bench.refDecision(subset = true, nFailed = 0,
      load0 = 0.1, stealPct = 0.0, force = false) === "subset_skip")
    // failures mean partial totals
    assert(Bench.refDecision(subset = false, nFailed = 1,
      load0 = 0.1, stealPct = 0.0, force = false) === "failed_skip")
    // ambient load at/over 2 before the bench ran → refuse
    assert(Bench.refDecision(subset = false, nFailed = 0,
      load0 = 2.0, stealPct = 0.0, force = false) === "refused_noisy")
    // visible steal → refuse (the cleaner co-tenant signal)
    assert(Bench.refDecision(subset = false, nFailed = 0,
      load0 = 0.3, stealPct = 0.5, force = false) === "refused_noisy")
    // unreadable loadavg (-1) → refuse rather than trust
    assert(Bench.refDecision(subset = false, nFailed = 0,
      load0 = -1.0, stealPct = 0.0, force = false) === "refused_noisy")
    // force overrides the noise gate ONLY — never subset/failed
    assert(Bench.refDecision(subset = false, nFailed = 0,
      load0 = 9.0, stealPct = 3.0, force = true) === "written")
    assert(Bench.refDecision(subset = true, nFailed = 0,
      load0 = 9.0, stealPct = 3.0, force = true) === "subset_skip")
    assert(Bench.refDecision(subset = false, nFailed = 2,
      load0 = 9.0, stealPct = 3.0, force = true) === "failed_skip")
  }

  test("a different-sf run never replaces the reference") {
    // round 11: a calm, complete sf0.01 iteration run overwrote the
    // committed sf0.1 reference — every gate above passed, wrong number
    assert(Bench.refDecision(subset = false, nFailed = 0,
      load0 = 0.4, stealPct = 0.1, force = false,
      sfMatch = false) === "sf_mismatch_skip")
    // force is the deliberate re-pin escape hatch (e.g. moving the
    // reference to a new canonical sf)
    assert(Bench.refDecision(subset = false, nFailed = 0,
      load0 = 0.4, stealPct = 0.1, force = true,
      sfMatch = false) === "written")
    // sf gate still never overrides subset/failed
    assert(Bench.refDecision(subset = true, nFailed = 0,
      load0 = 0.4, stealPct = 0.1, force = true,
      sfMatch = false) === "subset_skip")
    // the mismatch must out-rank the noise verdict: a noisy wrong-sf
    // run reports the sf problem, not the noise
    assert(Bench.refDecision(subset = false, nFailed = 0,
      load0 = 9.0, stealPct = 3.0, force = false,
      sfMatch = false) === "sf_mismatch_skip")
  }

  test("uniform inflation vs the committed reference refuses the re-pin") {
    // the r13 hole: a uniformly slow box-day (every query ~1.3x) passes
    // every instant noise gate and replaces a calm pin with an inflated
    // one — the cross-run normalizer catches exactly this
    assert(Bench.refDecision(subset = false, nFailed = 0,
      load0 = 0.4, stealPct = 0.1, force = false,
      medianRatio = Some(1.30)) === "refused_inflated")
    // honest jitter / small code-wide constants under the cap still pin
    assert(Bench.refDecision(subset = false, nFailed = 0,
      load0 = 0.4, stealPct = 0.1, force = false,
      medianRatio = Some(1.10)) === "written")
    // a uniformly FASTER run re-pins freely (restores the comparator)
    assert(Bench.refDecision(subset = false, nFailed = 0,
      load0 = 0.4, stealPct = 0.1, force = false,
      medianRatio = Some(0.80)) === "written")
    // no comparable committed reference -> nothing to normalize against
    assert(Bench.refDecision(subset = false, nFailed = 0,
      load0 = 0.4, stealPct = 0.1, force = false,
      medianRatio = None) === "written")
    // force is the deliberate escape hatch for the inflation gate too
    assert(Bench.refDecision(subset = false, nFailed = 0,
      load0 = 0.4, stealPct = 0.1, force = true,
      medianRatio = Some(2.0)) === "written")
    // inflation out-ranks the noise verdict (the more specific signal)
    assert(Bench.refDecision(subset = false, nFailed = 0,
      load0 = 9.0, stealPct = 3.0, force = false,
      medianRatio = Some(1.30)) === "refused_inflated")
  }

  test("medianRefRatio: shared >0.3s queries only, min-count guarded") {
    val ref = (1 to 10).map(i => s"q$i" -> 1.0).toMap +
      ("tiny" -> 0.1) + ("missing" -> 5.0)
    // uniform 1.3x inflation on the shared slow rows; the tiny row and
    // the reference-only row must not dilute the median
    val cur = (1 to 10).map(i => s"q$i" -> 1.3).toMap +
      ("tiny" -> 10.0) + ("extra" -> 99.0)
    val r = Bench.medianRefRatio(cur, ref)
    assert(r.isDefined && math.abs(r.get - 1.3) < 1e-9)
    // under the min-shared floor: no verdict
    val few = (1 to 5).map(i => s"q$i" -> 1.0).toMap
    assert(Bench.medianRefRatio(
      few.map { case (k, _) => k -> 1.3 }, few).isEmpty)
  }
}
