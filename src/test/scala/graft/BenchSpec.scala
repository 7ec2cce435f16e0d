package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's self-adjudication arithmetic — pure functions
  * only (the sweep itself is the driver's job, not a unit test's).
  */
class BenchSpec extends AnyFunSuite {

  test("suspect threshold tracks the anchor band between the floor " +
    "and the clamp") {
    // quiet window: the 1.3 jitter floor rules
    assert(Bench.suspectBandThreshold(1.05) === 1.3)
    assert(Bench.suspectBandThreshold(0.0) === 1.3)
    // moderately loaded window: the observed band IS the bar
    assert(Bench.suspectBandThreshold(1.9) === 1.9)
    assert(Bench.suspectBandThreshold(2.8) === 2.8)
  }

  test("a single huge anchor excursion cannot disable the flagger " +
    "(r15: band 9.53 made suspect count 0 on a sweep full of " +
    "3-7x ballooned rows)") {
    assert(Bench.suspectBandThreshold(9.53) === 3.0)
    assert(Bench.suspectBandThreshold(Double.MaxValue) === 3.0)
    // a row ballooned 3.5x in that window must now clear the bar
    val ballooned = 3.5
    assert(ballooned > Bench.suspectBandThreshold(9.53))
  }
}
