package graft.tools

import org.scalatest.funsuite.AnyFunSuite

class ProcSpec extends AnyFunSuite {
  // field layout: pid (comm) state ppid pgrp session tty tpgid flags minflt …
  test("parseMinorFaults indexes after the last ')' (comm with spaces/parens)") {
    assert(Proc.parseMinorFaults(
      "1234 (java) S 1 1234 1234 0 -1 4194560 98765 0 0 0") === 98765L)
    // a comm containing spaces AND a ')' must not shift the field index
    assert(Proc.parseMinorFaults(
      "77 (my (weird) app) R 1 77 77 0 -1 4194560 42 0 0 0") === 42L)
  }

  test("minorFaults reads this process (monotone, non-negative on Linux)") {
    val a = Proc.minorFaults()
    assume(a >= 0, "no /proc on this platform")
    val waste = Array.fill(1 << 20)(1L) // touch ~8 MB so the counter moves
    assert(waste.length > 0)
    assert(Proc.minorFaults() >= a)
  }

  test("processCpuNanos: monotone non-negative on HotSpot") {
    val a = Proc.processCpuNanos()
    assume(a >= 0, "no com.sun.management bean on this JVM")
    var x = 0L
    var i = 0
    while (i < 20000000) { x += i; i += 1 } // burn ~10ms of CPU
    assert(x != 0)
    assert(Proc.processCpuNanos() >= a)
  }

  test("envFlag: set-and-truthy only") {
    // can't set env vars in-process portably; exercise the rule's shape
    // via the values it classifies
    def truthy(v: String) = v.nonEmpty && v != "0" && v != "false"
    assert(truthy("1") && truthy("true") && truthy("yes"))
    assert(!truthy("") && !truthy("0") && !truthy("false"))
    assert(!Proc.envFlag("GRAFT_TEST_SURELY_UNSET_VAR"))
  }
}
