package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench regression gate's arithmetic, pinned without a Spark
  * session: above-floor ratios, the absolute-growth arm, the
  * floor-clamp epsilon, and re-pass contention scaling. */
class BenchGateSpec extends AnyFunSuite {
  private val floor = 0.12

  test("floor dilution: a doubled 0.58 s kernel under the floor slips " +
      "a raw 2x ratio but not the above-floor gate") {
    val base = floor + 0.58 // 0.70 recorded
    val now = floor + 1.25 // kernel 2.2x -> 1.37 observed
    assert(now / base < 2.0, "raw ratio must NOT catch this (the bug)")
    assert(Bench.regressed(now, base, floor, gateScale = 1.0))
  }

  test("absolute arm: sub-0.5 s growth never flags, however large the " +
      "ratio") {
    assert(!Bench.regressed(now = 0.45, base = 0.15, floor = floor, 1.0))
    assert(!Bench.regressed(now = 0.60, base = 0.13, floor = floor, 1.0))
  }

  test("a baseline at or below the floor cannot divide by ~0: growth " +
      "must still clear the absolute arm AND the clamped ratio") {
    // base == floor -> adjBase clamps to 0.010; a 0.4 s key is not a
    // 2x-of-epsilon panic unless it also grew >0.5 s
    assert(!Bench.regressed(now = 0.40, base = floor, floor = floor, 1.0))
    assert(Bench.regressed(now = 0.80, base = floor, floor = floor, 1.0))
  }

  test("re-pass contention scale: uniform 2x environment inflation " +
      "does not read as a code regression once canaries scale the gate") {
    val base = 0.70
    val now = 1.40 // everything doubled by a contended machine
    assert(Bench.regressed(now, base, floor, gateScale = 1.0),
      "unscaled, the inflation would flag")
    assert(!Bench.regressed(now, base, floor, gateScale = 2.0),
      "scaled by the observed canary ratio, it must not")
  }

  test("a real regression survives the contention scale") {
    val base = 0.70
    val now = 3.5 // 5x while canaries read 2x
    assert(Bench.regressed(now, base, floor, gateScale = 2.0))
  }

  test("median: odd, even, empty") {
    assert(Bench.median(Seq(3, 1, 2).map(_.toDouble)) == 2.0)
    assert(Bench.median(Seq(4, 1, 2, 3).map(_.toDouble)) == 2.5)
    assert(Bench.median(Nil).isNaN)
  }

  test("baseline note: a query literally named note cannot shadow the " +
      "top-level field") {
    val txt = """{"total":1.0,"queries":{"note":0.123,"q1":0.5},""" +
      """"note":"the real adjudication","sf":"/x"}"""
    assert(Bench.readBaselineNoteFrom(txt).contains("the real adjudication"))
  }

  test("baseline note: an escaped quote does not truncate the note " +
      "mid-sentence") {
    val txt = """{"queries":{"q1":0.5},"note":"reset \"q1\" after rewrite","sf":"/x"}"""
    val n = Bench.readBaselineNoteFrom(txt).get
    assert(n.contains("after rewrite"), s"truncated: '$n'")
  }

  test("aboveFloorRatio: sub-floor baselines excluded, floor " +
      "differenced from both sides, empty overlap yields None") {
    val floor = 0.1
    val timed = Map("slow" -> 1.1, "fast" -> 0.15, "subfloor" -> 0.4,
      "unbaselined" -> 9.9)
    val baselines = Map("slow" -> 0.6, "fast" -> 0.3,
      "subfloor" -> 0.15, // <= 2x floor: excluded even though it "4x'd"
      "missing" -> 1.0)
    val (n, ratio) = Bench.aboveFloorRatio(timed, baselines, floor)
    assert(n == 2) // slow + fast; subfloor excluded, unbaselined skipped
    // now-above = (1.1-0.1) + (0.15-0.1) = 1.05
    // base-above = (0.6-0.1) + (0.3-0.1) = 0.7
    assert(math.abs(ratio.get - 1.05 / 0.7) < 1e-12)
    assert(Bench.aboveFloorRatio(Map("a" -> 1.0),
      Map.empty, floor)._2.isEmpty)
    // a timed value BELOW the floor clamps to 0 contribution, not
    // negative credit
    val (_, r2) = Bench.aboveFloorRatio(Map("slow" -> 0.05),
      Map("slow" -> 0.6), floor)
    assert(r2.get == 0.0)
    // each side differenced by ITS OWN floor: a floor that drifted up
    // since the record was merged must not read as a code regression
    val (_, r3) = Bench.aboveFloorRatio(Map("slow" -> 0.29),
      Map("slow" -> 0.25), floor = 0.09, baseFloor = Some(0.05))
    assert(math.abs(r3.get - 0.20 / 0.20) < 1e-12,
      s"floor drift mis-read as regression: ${r3.get}")
  }
}
