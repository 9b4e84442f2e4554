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
}
