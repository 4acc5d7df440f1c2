package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[ProbeStats]] — the statistics definitions every
  * THROUGHPUT.json number flows through. These were private inline
  * lambdas inside ThroughputProbe's `main` until round 12; a silent
  * edit (e.g. nearest-rank → interpolated percentile, or dropping the
  * last trigger's execution from the wall denominator) would change
  * the committed latency/throughput claims with no test tripping.
  * No SparkSession needed — pure arithmetic.
  */
class ProbeStatsSpec extends AnyFunSuite {

  test("pct is nearest-rank: p95 of 1..100 is 95, of 1..20 is 19") {
    assert(ProbeStats.pct((1L to 100L), 0.95) == 95L)
    // ceil(0.95 * 20) = 19 → the 19th smallest, NOT an interpolation
    assert(ProbeStats.pct((1L to 20L), 0.95) == 19L)
    assert(ProbeStats.pct((1L to 20L), 0.50) == 10L)
    assert(ProbeStats.pct((1L to 20L), 1.0) == 20L)
  }

  test("pct clamps to the sequence at the extremes") {
    assert(ProbeStats.pct(Seq(42L), 0.95) == 42L)
    assert(ProbeStats.pct(Seq(42L), 0.0) == 42L) // rank 0 clamps up to 1
    assert(ProbeStats.pct(Seq(7L, 9L), 0.01) == 7L)
  }

  test("pct returns an observed value with at least ceil(p*n) at-or-below it") {
    val rnd = new scala.util.Random(12L)
    for (_ <- 1 to 300) {
      val n = 1 + rnd.nextInt(60)
      val s = Seq.fill(n)(rnd.nextLong(5000L)).sorted
      val p = 0.01 + rnd.nextDouble() * 0.99
      val v = ProbeStats.pct(s, p)
      assert(s.contains(v))
      val rank = math.min(s.size, math.max(1, math.ceil(p * s.size).toInt))
      assert(s.count(_ <= v) >= rank,
             s"n=$n p=$p v=$v: fewer than rank-$rank elements at-or-below")
    }
  }

  test("wall denominator is first trigger start -> last trigger END") {
    // 3 triggers at t=0,1000,2000ms, last one executing 431ms: the
    // sustained denominator bills the pacing gaps AND the final
    // execution — 2431ms, not 2000 (truncating the last execution
    // would inflate the sustained rate)
    assert(ProbeStats.wallMs(0L, 2000L, 431L) == 2431L)
    assert(ProbeStats.sustainedPerSec(15000L, 3000L) == 5000.0)
  }

  test("e2e composition and zero-backlog semantics") {
    // worst case: an event waits one full interval, then one p95 exec
    assert(ProbeStats.e2eP95Ms(1000L, 621L) == 1621L)
    // keeping up means the p95 execution fits STRICTLY inside the
    // interval; exec == interval is already the saturation boundary
    assert(ProbeStats.zeroBacklog(1000L, 999L))
    assert(!ProbeStats.zeroBacklog(1000L, 1000L))
    assert(!ProbeStats.zeroBacklog(1000L, 1400L))
  }

  test("chained composition adds the measured handoff gap to leg 1") {
    assert(ProbeStats.chainedE2eP95Ms(1000L, 621L, 310L) == 1931L)
    // degenerate gap of 0 collapses to the single-query worst case
    assert(ProbeStats.chainedE2eP95Ms(1000L, 621L, 0L) ==
      ProbeStats.e2eP95Ms(1000L, 621L))
  }
}
