package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench measurement-trust rules on the exact historical shapes
  * that motivated them (SCALE.md "bench trustworthiness"; r10 verdict
  * "What's wrong" #2). The rules run inside Bench's main — this suite is
  * what makes the distrust logic regression-checkable without driving a
  * full bench. */
class BenchTrustSpec extends AnyFunSuite {
  private val tol = 2.0
  private val slack = 0.5

  test("rule 2 (round 6): r5's d05 shape — median far above own best rep") {
    // r5 shipped d05 at median 17.2 with reps [2.26, 17.2, 25.07]
    val reps = Seq(2.26, 17.2, 25.07)
    assert(!BenchTrust.medianConverged(17.2, reps, tol, slack))
    // rule 3 also fires on the same shape (the rules overlap here)
    assert(!BenchTrust.repSpreadOk(reps, tol, slack))
  }

  test("rule 3 (round 11): median near the min no longer masks a wild max rep") {
    // median adjacent to min passes rule 2 but the 3x max rep means the
    // box changed speed mid-query — rule 3 is the only within-run catch
    val reps = Seq(2.0, 2.2, 6.8)
    assert(BenchTrust.medianConverged(2.2, reps, tol, slack))
    assert(!BenchTrust.repSpreadOk(reps, tol, slack))
    assert(!BenchTrust.healthy(2.2, reps, 0.35, 0.4, 0.31, tol, slack))
  }

  test("rule 3 slack: sub-second compile/dispatch jitter is not flagged") {
    assert(BenchTrust.repSpreadOk(Seq(0.3, 0.5, 1.1), tol, slack))
    assert(BenchTrust.repSpreadOk(Nil, tol, slack), "no reps = reported failed, not unhealthy")
  }

  test("r10's d49 shape: uniform inflation passes every within-run rule — " +
       "the prior-run reference is the designed catch") {
    // every rep inflated together (degraded burst spanning the whole
    // query) with healthy canaries around it: within-run evidence is
    // structurally blind to this
    val reps = Seq(6.78, 8.58, 10.57)
    assert(BenchTrust.healthy(8.58, reps, 0.35, 0.4, 0.31, tol, slack))
    // ... but the committed-history rule flags it at its measured 5.4x
    val out = BenchTrust.priorOutliers(
      Map("d49_incremental_dedup" -> 8.58, "d01_tokens" -> 7.17, "ok_q" -> 1.0),
      Map("d49_incremental_dedup" -> 1.59, "d01_tokens" -> 0.91, "ok_q" -> 0.9),
      tol)
    assert(out.keySet == Set("d49_incremental_dedup", "d01_tokens"))
    assert(math.abs(out("d49_incremental_dedup") - 8.58 / 1.59) < 1e-9)
  }

  test("rule 1: bracketing canaries vs the run's best") {
    assert(BenchTrust.canariesOk(0.35, 0.55, 0.31, tol))
    assert(!BenchTrust.canariesOk(2.76, 2.48, 0.31, tol), "r10's degraded window")
  }

  test("priorOutliers ignores missing names, failed medians, and the exact-2x edge") {
    val out = BenchTrust.priorOutliers(
      Map("new_q" -> 5.0, "crashed" -> -1.0, "edge" -> 2.0, "prior_crashed" -> 3.0),
      Map("edge" -> 1.0, "crashed" -> 1.0, "prior_crashed" -> -1.0), tol)
    assert(out.isEmpty, s"got $out")
  }

  test("parseQueriesMap round-trips Bench's own JSON line and rejects garbage") {
    val line = """{"metric":"total","value":73.6,"unit":"sec","reps":3,""" +
      """"queries":{"a01_reports_stats":0.42,"d49_incremental_dedup":1.59},""" +
      """"spread":{"a01_reports_stats":[0.40,0.47]},"trusted":true,"sf":"/x"}"""
    assert(BenchTrust.parseQueriesMap(line) ==
      Map("a01_reports_stats" -> 0.42, "d49_incremental_dedup" -> 1.59))
    assert(BenchTrust.parseQueriesMap("") == Map.empty[String, Double])
    assert(BenchTrust.parseQueriesMap("not json at all") == Map.empty[String, Double])
    assert(BenchTrust.parseQueriesMap("""{"queries":{"q":oops}}""") ==
      Map.empty[String, Double])
  }

  test("parseQueriesMap handles scientific notation (sub-ms medians must not vanish)") {
    assert(BenchTrust.parseQueriesMap("""{"queries":{"q1":4.2E-4,"q2":1.5e3,"q3":0.5}}""") ==
      Map("q1" -> 4.2e-4, "q2" -> 1.5e3, "q3" -> 0.5))
  }

  test("floorSafe: only full, trusted, fully-measured, non-regressed runs take the floor slot") {
    assert(BenchTrust.floorSafe(filtered = false, trusted = true,
      allMeasured = true, priorRegressedEmpty = true, acceptPrior = false))
    // each disqualifier alone blocks the overwrite
    assert(!BenchTrust.floorSafe(true, true, true, true, false), "filtered dev run")
    assert(!BenchTrust.floorSafe(false, false, true, true, false), "untrusted run")
    assert(!BenchTrust.floorSafe(false, true, false, true, false),
      "crashed query: its -1 would permanently disable the prior rule")
    assert(!BenchTrust.floorSafe(false, true, true, false, false), "residual regression")
    // explicit operator acceptance of an intentional slowdown
    assert(BenchTrust.floorSafe(false, true, true, false, acceptPrior = true))
    assert(!BenchTrust.floorSafe(false, false, true, false, acceptPrior = true),
      "acceptPrior waives the regression check only, not trust")
    // a trusted full-suite run at a DIFFERENT SF than the committed
    // floor skipped the prior compare entirely (vacuously empty
    // prior_regressed) — it must not silently replace the floor with
    // numbers at another scale (the scale-study clobber hole, r12)
    assert(!BenchTrust.floorSafe(false, true, true, true, false,
      sfMatchesPrior = false), "different-SF scale study run")
    assert(BenchTrust.floorSafe(false, true, true, true, acceptPrior = true,
      sfMatchesPrior = false),
      "acceptPrior is the explicit floor re-base at a new SF")
  }

  test("floorSafe is MONOTONE (round 15): the r14 shape — a uniformly ~1.3x-elevated " +
    "trusted run with empty prior_regressed must NOT re-base the floor") {
    // the r14 driver window: trusted:true, untrusted:[], all measured,
    // every per-query ratio ~1.23-1.75x (under the 2x priorTol, so
    // prior_regressed empty) — yet the TOTAL ran 60.94 -> 81.5 s. The
    // box's demonstrated capability is still 60.94; only a run at least
    // that fast may take the slot.
    val floor = Map("a" -> 10.0, "b" -> 20.0, "c" -> 30.0)
    val elevated = floor.view.mapValues(_ * 1.3).toMap
    assert(BenchTrust.priorOutliers(elevated, floor, 2.0).isEmpty,
      "precondition: uniform 1.3x passes the per-query prior gate")
    val totalNotWorse = elevated.values.sum <= floor.values.sum
    assert(!totalNotWorse)
    assert(!BenchTrust.floorSafe(false, true, true,
      priorRegressedEmpty = true, acceptPrior = false,
      sfMatchesPrior = true, totalNotWorse = totalNotWorse),
      "the uniform-elevation run must route to BENCH_LOCAL_DEGRADED.json")
    // an equal-or-faster run still takes the slot; acceptPrior is the
    // explicit re-base for an intentional slowdown
    assert(BenchTrust.floorSafe(false, true, true, true, false,
      sfMatchesPrior = true, totalNotWorse = true))
    assert(BenchTrust.floorSafe(false, true, true, true, acceptPrior = true,
      sfMatchesPrior = true, totalNotWorse = false))
  }

  test("totalNotWorse compares over the INTERSECTION of query names (round 16): " +
    "registry growth must not wedge the gate, shrinkage must not rebase it lower") {
    val floor = Map("a" -> 10.0, "b" -> 20.0, "c" -> 30.0)
    // GROWTH: same speed on the shared names + 7 new queries' honest
    // cost. A raw-total compare (60 + new > 60) would fail every future
    // healthy run forever; the shared-name compare passes.
    val grown = floor ++ Map("d_new1" -> 5.0, "d_new2" -> 9.0)
    assert(BenchTrust.totalNotWorse(grown, floor),
      "new registry entries must not block the floor gate")
    // ...but a genuinely slower run still fails on the shared names
    val grownSlower = floor.view.mapValues(_ * 1.3).toMap + ("d_new1" -> 5.0)
    assert(!BenchTrust.totalNotWorse(grownSlower, floor))
    // SHRINKAGE: dropping a query must not count as a speedup — the
    // removed name stops counting on BOTH sides, so a same-speed run
    // passes and a slower one still fails
    val shrunkSame = floor - "c"
    assert(BenchTrust.totalNotWorse(shrunkSame, floor))
    val shrunkSlower = (floor - "c").view.mapValues(_ * 1.5).toMap
    assert(!BenchTrust.totalNotWorse(shrunkSlower, floor),
      "removing a query must not let an elevated run rebase the floor")
    // permissive fallbacks: no prior map / disjoint names — a clean run
    // must be able to repair a missing or renamed-world floor
    assert(BenchTrust.totalNotWorse(floor, Map.empty))
    assert(BenchTrust.totalNotWorse(floor, Map("zz" -> 1.0)))
    // crash sentinels (-1 medians) excluded on either side: a crashed
    // query must not subtract from a total
    assert(!BenchTrust.totalNotWorse(
      Map("a" -> 15.0, "b" -> -1.0), Map("a" -> 10.0, "b" -> 20.0)))
  }

  test("parseTotal reads the committed floor's total; absent/corrupt -> None") {
    assert(BenchTrust.parseTotal(
      """{"metric":"total","value":60.942053609,"unit":"sec"}""")
      .contains(60.942053609))
    assert(BenchTrust.parseTotal("""{"metric":"total"}""").isEmpty)
    assert(BenchTrust.parseTotal("").isEmpty)
    // scientific notation, same grammar as parseQueriesMap
    assert(BenchTrust.parseTotal("""{"value":6.1E1}""").contains(61.0))
  }

  test("parseSf extracts the prior run's scale dir (same-SF guard for priorOutliers)") {
    assert(BenchTrust.parseSf("""{"queries":{},"sf":"/root/testdata/sf0.1"}""")
      .contains("/root/testdata/sf0.1"))
    assert(BenchTrust.parseSf("""{"queries":{}}""").isEmpty)
  }
}
