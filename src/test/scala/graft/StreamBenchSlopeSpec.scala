package graft

import org.scalatest.funsuite.AnyFunSuite

/** StreamBench.growthSlope — the number the growing-index lanes
  * (knn_graph_ingest, split_maintenance) report so state-growth
  * flatness is asserted by metric, not eyeball. The function is pure;
  * this pins its exact semantics (warmup drop, equal halves, odd
  * middle, short-series sentinel). The BOUND on the real lanes lives
  * in the BENCH_STREAMING.json artifact at bench scale — at spec scale
  * fixed per-trigger overhead would mask an O(state) regression, so a
  * tiny-lane wall-clock assertion here would be a flaky non-witness. */
class StreamBenchSlopeSpec extends AnyFunSuite {

  test("flat steady-state reads 1.0 with the warmup trigger excluded") {
    // a 100x warmup spike must not tilt the slope
    assert(StreamBench.growthSlope(
      Seq(100.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0)) === 1.0)
  }

  test("a doubling second half reads 2.0") {
    assert(StreamBench.growthSlope(
      Seq(9.0, 1.0, 1.0, 1.0, 1.0, 2.0, 2.0, 2.0, 2.0)) === 2.0)
  }

  test("equal halves: an odd middle trigger is dropped, not assigned") {
    // steady = (1, 1, 5, 2, 2): halves of 2 — the 5 in the middle
    // belongs to neither half and cannot fake a climb
    assert(StreamBench.growthSlope(
      Seq(9.0, 1.0, 1.0, 5.0, 2.0, 2.0)) === 2.0)
  }

  test("fewer than 4 steady triggers is the -1 sentinel, not noise") {
    assert(StreamBench.growthSlope(Seq(9.0, 1.0, 2.0, 3.0)) === -1.0)
    assert(StreamBench.growthSlope(Seq.empty) === -1.0)
  }

  test("p50 halves resist a single outlier trigger") {
    // one 50 ms GC spike in the second half must not read as growth
    assert(StreamBench.growthSlope(
      Seq(9.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 50.0, 1.0)) === 1.0)
  }
}
