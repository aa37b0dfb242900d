package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for Bench's steady-profile guard logic ([[Bench.hazeTrip]])
  * — no Spark session; the selection rules are pure. The scenario each
  * case encodes is a MEASURED failure mode from the round history:
  * r9 phantom entries (ambient haze under the 2x trip), r10's
  * q_pagerank 1.59x / q_modularity 1.80x sliding under it. */
class BenchLogicSpec extends AnyFunSuite {

  test("quiet suite: trip stays at profileK, only >2x entries re-run") {
    // one outlier at 2.5x over a large quiet suite: total stays under
    // 1.1x, so the per-entry 2x rule alone fires
    val profile = Map("a" -> 10.0, "b" -> 20.0, "c" -> 1.0)
    val steady = Map("a" -> 10.2, "b" -> 20.4, "c" -> 2.5)
    val (hazy, trip, sus) = Bench.hazeTrip(steady, profile, 2.0, 0.5)
    assert(!hazy && trip == 2.0 && sus == Seq("c"))
  }

  test("hazy suite (>1.1x total): trip tightens to 1.4x and the band re-runs") {
    // every entry 1.6x its profile — r10's exact blind spot: no entry
    // over 2x, total 60% inflated, official record poisoned
    val profile = Map("a" -> 1.0, "b" -> 2.0, "c" -> 4.0)
    val steady = profile.map { case (k, v) => k -> v * 1.6 }
    val (hazy, trip, sus) = Bench.hazeTrip(steady, profile, 2.0, 0.5)
    assert(hazy && trip == 1.4 && sus == Seq("a", "b", "c"))
  }

  test("absolute floor: sub-floor wobble never re-runs, even when hazy") {
    val profile = Map("tiny" -> 0.1, "big" -> 10.0)
    val steady = Map("tiny" -> 0.3, "big" -> 16.0) // 3x and 1.6x; total 1.6x
    val (hazy, trip, sus) = Bench.hazeTrip(steady, profile, 2.0, 0.5)
    assert(hazy && trip == 1.4 && sus == Seq("big"),
      "tiny is 3x its profile but under the floor — JIT depth, not load")
  }

  test("no profile: nothing trips, no suite judgment") {
    val (hazy, trip, sus) =
      Bench.hazeTrip(Map("a" -> 5.0), Map.empty, 2.0, 0.5)
    assert(!hazy && trip == 2.0 && sus.isEmpty)
  }

  test("unprofiled new query is ignored by the trigger, not treated as drift") {
    val profile = Map("a" -> 1.0)
    val steady = Map("a" -> 1.0, "new_q" -> 50.0)
    val (hazy, _, sus) = Bench.hazeTrip(steady, profile, 2.0, 0.5)
    assert(!hazy && sus.isEmpty)
  }
}
