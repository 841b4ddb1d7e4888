package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** Pins the ScaleBench published-best selection rule (r13 ADVICE: the
  * ratio used the raw min of all runs per scale, so an anomalously
  * FAST outlier could silently set a flagship ratio even when the
  * tie-breaking third run showed it was the outlier).
  */
class ScaleBenchSpec extends AnyFunSuite {

  test("an agreeing pair publishes its min (steady-state, codegen excluded)") {
    assert(ScaleBench.bestSec(Seq(12.0, 10.5)) == (10.5, "min_of_pair"))
    // first-execution codegen on the large side: slower first run
    assert(ScaleBench.bestSec(Seq(19.0, 10.5)) == (10.5, "min_of_pair"))
  }

  test("with a third run, the median publishes — a fast outlier can't set the ratio") {
    // the r12 q65 shape (5.5/34.4 s pair) plus a third run agreeing
    // with the FAST side: median = a member of the agreeing pair
    assert(ScaleBench.bestSec(Seq(5.5, 34.4, 6.0)) == (6.0, "median_of_3"))
    // third run agrees with the SLOW side: the fast run was the
    // outlier — under the old min rule it still set the ratio
    assert(ScaleBench.bestSec(Seq(2.4, 1.0, 2.3)) == (2.3, "median_of_3"))
    // an anomalously slow outlier stays excluded exactly as before
    assert(ScaleBench.bestSec(Seq(10.0, 30.0, 11.0)) == (11.0, "median_of_3"))
  }
}
