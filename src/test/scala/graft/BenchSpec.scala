package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench harness's stall-rejection scheme (no Spark session —
  * the properties under test are pure scheduling math).
  *
  * Background: Bench interleaves iterations (pass 1 of every query,
  * then pass 2, …) so a single stall poisons at most one sample per
  * query. That is NOT enough when the stall recurs: passes have
  * similar durations, so a periodic co-tenant stall lands at the same
  * within-pass offset each pass and hits the same registry-adjacent
  * queries repeatedly — median-of-3 cannot reject two poisoned
  * samples. BENCH_r11 recorded exactly this (e08/e09 medians +4.5 s
  * and +4.8 s that an idle re-run disproved). The fix is a
  * deterministic per-iteration rotation of the execution order; this
  * spec reproduces the r11 failure mode in a synthetic-stall
  * simulation and shows rotation rejects it.
  */
class BenchSpec extends AnyFunSuite {

  test("rotated is deterministic, a permutation, and spreads offsets") {
    val xs = (0 until 118).toVector
    for (it <- 0 until 3) {
      val r = Bench.rotated(xs, it, 3)
      assert(r.sorted == xs, "each pass must run every query exactly once")
      assert(r == Bench.rotated(xs, it, 3), "pure function of (it, iters)")
    }
    // offsets are maximally spread: 0, n/3, 2n/3
    assert(Bench.rotated(xs, 0, 3).head == 0)
    assert(Bench.rotated(xs, 1, 3).head == 118 / 3)
    assert(Bench.rotated(xs, 2, 3).head == 2 * 118 / 3)
    // degenerate inputs don't blow up
    assert(Bench.rotated(Vector.empty[Int], 1, 3).isEmpty)
    assert(Bench.rotated(xs, 0, 1) == xs)
  }

  /** Simulate the suite clock: queries run back-to-back per pass in
    * the given order; a sample overlapping any stall window gets the
    * stall charged to it (the co-tenant steals the cores). Returns
    * per-query samples across passes. */
  private def simulate(
      base: Map[String, Double],
      order: Int => Seq[String],
      iters: Int,
      stalls: Seq[(Double, Double)]): Map[String, Vector[Double]] = {
    var clock = 0.0
    val samples = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (it <- 0 until iters; q <- order(it)) {
      val start = clock
      val end0 = start + base(q)
      // a stall window overlapping [start, end0) adds its overlap-
      // extended duration: the query is frozen for the stall's length
      val stolen = stalls
        .collect { case (s, d) if s < end0 && s + d > start => d }.sum
      val end = end0 + stolen
      samples(q) = samples(q) :+ (end - start)
      clock = end
    }
    samples.toMap
  }

  test("recurring stall poisons fixed-order medians; rotation rejects it") {
    val n = 60
    val names = (0 until n).map(i => f"q$i%02d")
    val base = names.map(_ -> 1.0).toMap // 60 s per pass
    def med(ts: Vector[Double]) = ts.sorted.apply(ts.size / 2)

    // Two stall windows at the SAME within-pass offset of passes 2 and
    // 3 (the r11 diagnosis: a co-tenant stall window hit 2 of 3
    // interleaved passes over the adjacent registry region). Pass k
    // spans [60k, 60(k+1)) when unstalled; put 5 s stalls at +30 s
    // into passes 1 and 2 (0-indexed). The first stall shifts the
    // later clock, so place the second relative to the shifted pass
    // start (65 + 60 = 125 → +30 = 155).
    val stalls = Seq((90.0, 5.0), (155.0, 5.0))

    // Fixed order (the pre-r12 scheme): same sequence every pass.
    val fixed = simulate(base, _ => names, 3, stalls)
    val fixedPoisoned = names.filter(q => med(fixed(q)) > 1.5)
    assert(fixedPoisoned.nonEmpty,
      "the synthetic stall must reproduce the r11 failure: at least one " +
        "query's median poisoned under fixed order")

    // Rotated order (the r12 scheme): same stalls, same budget.
    val rot = simulate(base, it => Bench.rotated(names, it, 3), 3, stalls)
    val rotPoisoned = names.filter(q => med(rot(q)) > 1.5)
    assert(rotPoisoned.isEmpty,
      s"rotation must leave every median clean; poisoned: $rotPoisoned " +
        s"(each query may carry at most one stalled sample of 3)")
    // and the min stays exact for everyone under both schemes
    names.foreach { q =>
      assert(fixed(q).min == 1.0 && rot(q).min == 1.0)
    }
  }
}
