package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench harness's single-rep outlier amnesty (r18, judge task
  * #4): r17's driver artifact carried rc=1 because ONE q44 rep spiked to
  * 43.53 s (reps 4.02/4.51/43.53) while min and median matched every
  * prior round — a co-tenant/GC burst, not a regression. The amnesty
  * must clear exactly that shape (one confirming extra rep, spike
  * dropped) and must NOT clear a genuinely bimodal distribution. */
class BenchSpec extends AnyFunSuite {

  test("r17's q44 rep-set: spike dropped after one confirming extra rep") {
    var extraRuns = 0
    val (kept, fired) = Bench.dropOutlier(
      Vector(4.02, 4.51, 43.53), () => { extraRuns += 1; 4.30 })
    assert(fired)
    assert(extraRuns == 1)
    assert(kept == Vector(4.02, 4.30, 4.51))
    // post-amnesty spread is far under every guard trigger
    assert(kept.last / kept.head < 2.0)
  }

  test("clean rep-set: untouched, no extra rep spent") {
    var extraRuns = 0
    val (kept, fired) = Bench.dropOutlier(
      Vector(4.5, 4.1, 4.3), () => { extraRuns += 1; 99.0 })
    assert(!fired)
    assert(extraRuns == 0)
    assert(kept == Vector(4.1, 4.3, 4.5)) // sorted, values intact
  }

  test("extra rep that ALSO spikes leaves a violation for the guard") {
    val (kept, fired) = Bench.dropOutlier(
      Vector(4.02, 4.51, 43.53), () => 44.0)
    assert(fired)
    // the largest of the four is dropped, but the second spike stays —
    // the variance guard still sees a >3x spread and escalates
    assert(kept == Vector(4.02, 4.51, 43.53))
    assert(kept.last / kept.head > 3.0)
  }

  test("bimodal rep-set (median itself high): no amnesty") {
    var extraRuns = 0
    val (kept, fired) = Bench.dropOutlier(
      Vector(4.0, 40.0, 44.0), () => { extraRuns += 1; 4.2 })
    assert(!fired)
    assert(extraRuns == 0)
    assert(kept == Vector(4.0, 40.0, 44.0))
  }

  test("loose remaining reps: no amnesty even with a big max") {
    // rest spread 4.0 -> 13.0 is itself > 3x: the distribution is noisy
    // throughout, not one clean spike — re-measure, don't drop
    val (_, fired) = Bench.dropOutlier(Vector(4.0, 13.0, 60.0), () => 4.1)
    assert(!fired)
  }

  test("degenerate sizes: empty and singleton pass through") {
    assert(Bench.dropOutlier(Vector.empty, () => 1.0) == (Vector.empty, false))
    assert(Bench.dropOutlier(Vector(7.0), () => 1.0) == (Vector(7.0), false))
  }
}
