package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench retry-keep estimator — the rule that decides which
  * of two runs is PUBLISHED (r10 VERDICT What's-wrong #1: the rule
  * once kept a 122.4 s retry over a 14.3 s first run).
  */
class BenchEstimatorSpec extends AnyFunSuite {

  test("a retry materially slower than the first run is never kept") {
    // the r10 q53_fm committed case: first 14.3 s, retry 122.4 s,
    // retry clean on every other axis — must keep the FIRST run
    assert(!Bench.keepRetry(None, dt0 = 14.3, dt1 = 122.4,
      jitDelta = 60000L, jit1 = 1000L, retryMiniBursty = false))
    // jitter margin: an equal-time clean retry is still kept
    assert(Bench.keepRetry(None, dt0 = 10.0, dt1 = 11.9,
      jitDelta = 60000L, jit1 = 1000L, retryMiniBursty = false))
    assert(!Bench.keepRetry(None, dt0 = 10.0, dt1 = 12.1,
      jitDelta = 60000L, jit1 = 1000L, retryMiniBursty = false))
  }

  test("a clean faster retry replaces the first run") {
    assert(Bench.keepRetry(None, dt0 = 57.0, dt1 = 17.8,
      jitDelta = 55000L, jit1 = 2000L, retryMiniBursty = false))
  }

  test("a retry that reproduces the contamination keeps the first run") {
    // compile time did NOT materially drop (> half the first run's)
    assert(!Bench.keepRetry(None, dt0 = 30.0, dt1 = 20.0,
      jitDelta = 40000L, jit1 = 25000L, retryMiniBursty = false))
    // bursty post-run mini-calib: the retry's own window is dirty
    assert(!Bench.keepRetry(None, dt0 = 30.0, dt1 = 20.0,
      jitDelta = 40000L, jit1 = 1000L, retryMiniBursty = true))
    // errored retry never publishes
    assert(!Bench.keepRetry(Some("boom"), dt0 = 30.0, dt1 = 20.0,
      jitDelta = 40000L, jit1 = 1000L, retryMiniBursty = false))
  }

  test("the 5s JIT floor lets small-JIT retries through") {
    // jitDelta/2 = 2.5 s < floor; retry jit 4 s is under the 5 s floor
    assert(Bench.keepRetry(None, dt0 = 10.0, dt1 = 8.0,
      jitDelta = 5000L, jit1 = 4000L, retryMiniBursty = false))
    assert(!Bench.keepRetry(None, dt0 = 10.0, dt1 = 8.0,
      jitDelta = 5000L, jit1 = 5500L, retryMiniBursty = false))
  }

  test("robustLow: second-smallest once 3+ samples, so one fast outlier can't set the reference") {
    assert(Bench.robustLow(Nil).isEmpty)
    assert(Bench.robustLow(Seq(0.5)).contains(0.5))
    // with <3 samples there is nothing to attest against: plain min
    assert(Bench.robustLow(Seq(0.5, 0.3)).contains(0.3))
    // the r12-ADVICE scenario: a single 0.02 s timer outlier in an
    // otherwise-0.15 s timeline must NOT become the trigger reference
    // (1.5x of 0.02 would flag every sample and spuriously retry the
    // whole suite)
    assert(Bench.robustLow(Seq(0.15, 0.02, 0.16, 0.15)).contains(0.15))
    // but a genuine clean window (two+ attesting samples) still heals a
    // bursty suite head — the r12 roll-A defect stays fixed
    assert(Bench.robustLow(Seq(0.95, 0.96, 1.38, 0.15, 0.16)).contains(0.16))
  }
}
