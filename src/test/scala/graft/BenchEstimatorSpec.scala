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

  test("hostRatio: a burst anywhere in the query's window flags it, even past a clean own-sample") {
    // the r12 roll-b q86 shape: burst at groups 129/130, q86 at index
    // 134 whose OWN settled post-sample (group 134, nearest bracket) is
    // clean — a nearest-bracket-only rule reads 1.0 here and misses the
    // burst; the ±5 window must reach group 130 and flag it
    val q86 = Map(120 -> 0.15, 129 -> 0.55, 130 -> 0.90,
      133 -> 0.21, 134 -> 0.15, 140 -> 0.15)
    assert(math.abs(Bench.hostRatio(q86, 134, ref = 0.15) - 6.0) < 1e-9)
    // the r13 roll-A head-burst shape: first groups elevated, trigger
    // reference healed later — early queries flag via the head groups
    val head = Map(-1 -> 0.95, 2 -> 1.2, 9 -> 0.16)
    assert(math.abs(Bench.hostRatio(head, 1, ref = 0.15) - 8.0) < 1e-9)
    // sparse sampling: no group within the window — the nearest
    // brackets on each side still apply (a burst 9 indices back with
    // NO intervening sample cannot hide)
    assert(math.abs(Bench.hostRatio(Map(10 -> 0.90, 30 -> 0.15), 19,
      ref = 0.15) - 6.0) < 1e-9)
    // a burst OUTSIDE the window with a clean intervening group does
    // NOT flag — the host demonstrably recovered before the query
    assert(Bench.hostRatio(Map(10 -> 0.90, 18 -> 0.15, 30 -> 0.15),
      19, ref = 0.15) < 1.1)
    // clean window on both sides reads ~1x
    assert(Bench.hostRatio(Map(10 -> 0.15, 20 -> 0.16), 15, ref = 0.15) < 1.1)
    // degenerate inputs read clean, never divide by zero
    assert(Bench.hostRatio(Map.empty, 5, ref = 0.15) == 1.0)
    assert(Bench.hostRatio(Map(1 -> 0.15), 5, ref = 0.0) == 1.0)
  }
}
