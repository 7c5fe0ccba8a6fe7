package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guard-the-guard: [[BenchGuard]] is pure logic, so we can feed it the
  * exact telemetry of past poisoned artifacts and assert they now classify
  * as contended. No SparkSession needed.
  */
class BenchSpec extends AnyFunSuite {

  // r6's official artifact: loadavg 20.31 on a 32-cpu box, sentinel 0.661 s
  // — the old fixed 1.0 s bound signed off on it ("contended": false).
  test("r6 poisoned telemetry classifies as contended") {
    assert(!BenchGuard.quiet(load1 = 20.31, cores = 32, sentinelSec = 0.661,
      idleSentinelSec = 0.272))
    // each signal trips independently
    assert(!BenchGuard.quiet(20.31, 32, 0.30, 0.272)) // load alone
    assert(!BenchGuard.quiet(2.0, 32, 0.661, 0.272))  // sentinel alone
  }

  test("clean-run telemetry stays quiet") {
    // committed clean run at 1a54514: sentinels 0.272 / 0.342 s, idle box
    assert(BenchGuard.quiet(1.5, 32, 0.272, 0.272))
    assert(BenchGuard.quiet(0.02, 32, 0.342, 0.28))
    // exactly at the gates is still quiet (bounds are inclusive)
    assert(BenchGuard.quiet(8.0, 32, 0.56, 0.28))
    assert(!BenchGuard.quiet(8.01, 32, 0.56, 0.28))
    assert(!BenchGuard.quiet(8.0, 32, 0.561, 0.28))
  }

  test("unreadable loadavg (-1) falls back to sentinel-only gating") {
    assert(BenchGuard.quiet(-1.0, 32, 0.30, 0.28))
    assert(!BenchGuard.quiet(-1.0, 32, 0.70, 0.28))
  }

  test("post-tier gate ignores self-load but still catches a storm") {
    // a clean 32-thread tier ends at loadavg 11-13 by its own doing;
    // the sentinel (0.22-0.39 s, r7 clean run) proves cores are free
    assert(BenchGuard.quietPost(0.22, 0.28))
    assert(BenchGuard.quietPost(0.391, 0.28))
    // r6's external storm: sentinel 0.661 s trips regardless of loadavg
    assert(!BenchGuard.quietPost(0.661, 0.28))
  }

  test("pickCleaner prefers fewer failures over a smaller total") {
    val clean = Seq("a" -> 5.0, "b" -> 6.0)          // slower but complete
    val crashed = Seq("a" -> 1.0, "b" -> -1.0)       // "faster" by omission
    assert(BenchGuard.pickCleaner(clean, crashed) == clean)
    assert(BenchGuard.pickCleaner(crashed, clean) == clean)
  }

  test("pickCleaner compares totals only between identical failure sets") {
    val a = Seq("a" -> 3.0, "b" -> -1.0, "c" -> 2.0)
    val b = Seq("a" -> 1.0, "b" -> -1.0, "c" -> 1.5) // same failed set, faster
    assert(BenchGuard.pickCleaner(a, b) == b)
    // equal-sized but DIFFERENT failure sets: totals sum different queries,
    // incomparable — keep the first attempt deterministically
    val c = Seq("a" -> -1.0, "b" -> 0.1, "c" -> 0.1)
    assert(BenchGuard.pickCleaner(a, c) == a)
  }

  test("pickCleaner on two clean attempts keeps the faster") {
    val a = Seq("a" -> 3.0, "b" -> 3.0)
    val b = Seq("a" -> 2.0, "b" -> 2.0)
    assert(BenchGuard.pickCleaner(a, b) == b)
    assert(BenchGuard.pickCleaner(b, a) == b)
  }
}
