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

  test("stallFlag: the r13 roll-c q51 shape (wall 3x, every instrument clean, pre-cpu roll) gets the flag") {
    // constants replayed from the committed bench_full_r13_c.json row:
    // wall 22.13 s vs sibling median 7.24 s, steal 0.00064, minflt
    // 11623, gc/cpu predate the roll (-1), host_ratio 1.35 recomputed
    // from the roll's own raw calib_timeline, not retried
    assert(Bench.stallFlag(wall = 22.128, sibWallMed = 7.241,
      cpu = -1.0, sibCpuMed = 44.96, steal = 0.00064, minflt = 11623L,
      gcMs = -1L, retried = false, hostRatio = 1.35)
      .contains("stall_cpu_unconfirmed"))
    // the same shape in a roll WITH the cpu layer, cpu at its sibling
    // level (the authoritative/_f q51 cpu_sec values are 47.9/42.0 s):
    // the confirmed same-work-not-scheduled stall
    assert(Bench.stallFlag(wall = 22.128, sibWallMed = 7.241,
      cpu = 46.0, sibCpuMed = 44.96, steal = 0.00064, minflt = 11623L,
      gcMs = 0L, retried = false, hostRatio = 1.35).contains("stall"))
  }

  test("stallFlag: clean and attributed entries never flag") {
    // the authoritative roll's own q51 row: wall 8.25 s vs sibling
    // median 7.24 s (1.14x) — sibling agreement, no flag
    assert(Bench.stallFlag(8.247, 7.241, 47.94, 42.0, 0.00008, 10319L,
      0L, retried = false, hostRatio = 1.42).isEmpty)
    // the r13 _d q20 residual: wall 3.54 s vs 1.88 s median BUT its
    // recomputed host_ratio reads 7.52 — attributed as a host burst,
    // exactly how the r13 VERDICT predicted this rule would classify it
    assert(Bench.stallFlag(3.54, 1.88, -1.0, 3.23, 0.0, 3893L, 0L,
      retried = false, hostRatio = 7.52).isEmpty)
    // sub-second entries are scheduling noise, out of scope
    assert(Bench.stallFlag(0.9, 0.3, 1.0, 1.0, 0.0, 0L, 0L,
      retried = false, hostRatio = 1.0).isEmpty)
    // FASTER than the sibling median is never a stall
    assert(Bench.stallFlag(5.0, 9.0, 20.0, 20.0, 0.0, 0L, 0L,
      retried = false, hostRatio = 1.0).isEmpty)
    // each attribution instrument blocks the flag on its own:
    // steal, fault storm, GC debt (>20% of wall), a published retry
    assert(Bench.stallFlag(10.0, 5.0, 20.0, 20.0, 0.005, 0L, 0L,
      retried = false, hostRatio = 1.0).isEmpty)
    assert(Bench.stallFlag(10.0, 5.0, 20.0, 20.0, 0.0, 2000000L, 0L,
      retried = false, hostRatio = 1.0).isEmpty)
    assert(Bench.stallFlag(10.0, 5.0, 20.0, 20.0, 0.0, 0L, 2100L,
      retried = false, hostRatio = 1.0).isEmpty)
    assert(Bench.stallFlag(10.0, 5.0, 20.0, 20.0, 0.0, 0L, 0L,
      retried = true, hostRatio = 1.0).isEmpty)
    // an UNAVAILABLE gc bracket (-1, pre-gc roll) is not an attribution
    assert(Bench.stallFlag(10.0, 5.0, 20.0, 20.0, 0.0, 0L, -1L,
      retried = false, hostRatio = 1.0).contains("stall"))
  }

  test("stallFlag: golden vectors (shared fixture with the Python mirror)") {
    // r14 ADVICE: every committed queries_stall map is produced by
    // tools/recompute_stall.py and audit-verified against the same
    // Python code — circular. This test and audit_claims.py's
    // golden_vectors() consume the SAME committed fixture
    // (tools/stall_golden.json: replayed artifact rows + a boundary
    // probe at every threshold of the rule), so a drift in EITHER
    // implementation fails its own gate against a common reference.
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(new java.io.File("tools/stall_golden.json"))
    val vs = root.get("vectors")
    assert(vs != null && vs.size() >= 20, "golden fixture present and non-trivial")
    val seen = scala.collection.mutable.Set.empty[String]
    (0 until vs.size()).foreach { i =>
      val v = vs.get(i)
      val got = Bench.stallFlag(
        wall = v.get("wall").asDouble,
        sibWallMed = v.get("sib_wall_med").asDouble,
        cpu = v.get("cpu").asDouble,
        sibCpuMed = v.get("sib_cpu_med").asDouble,
        steal = v.get("steal").asDouble,
        minflt = v.get("minflt").asLong,
        gcMs = v.get("gc_ms").asLong,
        retried = v.get("retried").asBoolean,
        hostRatio = v.get("host_ratio").asDouble)
      val want =
        if (v.get("expect").isNull) None else Some(v.get("expect").asText)
      assert(got == want,
        s"golden vector '${v.get("note").asText}': got $got, want $want")
      want.foreach(seen += _)
    }
    // the fixture exercises every flag kind the rule can emit
    assert(seen == Set("stall", "excess_cpu", "low_cpu",
      "stall_cpu_unconfirmed"))
  }

  test("stallFlag: cpu moving WITH the wall is work variance, not a stall") {
    // wall 2x with cpu 2x: the query genuinely did more work
    assert(Bench.stallFlag(10.0, 5.0, 40.0, 20.0, 0.0, 0L, 0L,
      retried = false, hostRatio = 1.0).contains("excess_cpu"))
    // wall 2x with cpu materially BELOW its sibling median: also not
    // the same-work shape — flagged by its own name
    assert(Bench.stallFlag(10.0, 5.0, 10.0, 20.0, 0.0, 0L, 0L,
      retried = false, hostRatio = 1.0).contains("low_cpu"))
    // the band edge: 1.15x cpu still reads as same work
    assert(Bench.stallFlag(10.0, 5.0, 23.0, 20.0, 0.0, 0L, 0L,
      retried = false, hostRatio = 1.0).contains("stall"))
  }
}
