package graft

/** Pure contention-guard logic for [[Bench]], factored out so BenchSpec can
  * feed it recorded telemetry without a SparkSession.
  *
  * Two independent signals, either of which marks the box hot:
  *
  *  - '''loadavg''': 1-minute load above 25% of the core count means other
  *    processes already occupy a material slice of the machine. This is a
  *    hard gate — r6's poisoned artifact recorded loadavg 20.31 on a 32-cpu
  *    box yet passed the old sentinel-only check, because the sentinel bound
  *    (1.0 s) was ~4x the idle measurement and the storm left just enough
  *    headroom for a 0.66 s probe.
  *  - '''sentinel''': a fixed CPU-bound Spark job timed against a recorded
  *    idle calibration. Bound = 2x idle (clean runs measure ~0.27 s, so the
  *    default bound is ~0.55 s — which would have caught r6's 0.661 s).
  *
  * A load reading < 0 means /proc/loadavg was unreadable; only the sentinel
  * gates then.
  */
object BenchGuard {
  /** Fraction of cores the 1-min load may occupy before the box is hot.
    * 0.25 let the r8 sf0.1 tier start at load 6.3-7.3/32 and produce
    * physically-inverted timings (q_passage_dedup 0.72 s at sf0.1 vs
    * 0.17 s at sf10) while still stamping `clean:true` — tightened to
    * 0.15 per the r8 verdict.
    */
  val LoadFraction = 0.15
  /** Sentinel bound as a multiple of the recorded idle calibration. */
  val SentinelSlack = 2.0
  /** Recorded idle sentinel on this box (median of clean-run probes:
    * 0.272 / 0.342 s at `1a54514`). Override via SPARK_GRAFT_SENTINEL_IDLE.
    */
  val DefaultIdleSentinelSec = 0.28

  /** Is the box quiet enough to START a timed tier now? Gates on both
    * signals: stale external load shows in loadavg before it shows in
    * a single sentinel sample.
    */
  def quiet(load1: Double, cores: Int, sentinelSec: Double,
            idleSentinelSec: Double = DefaultIdleSentinelSec): Boolean = {
    val loadOk = load1 < 0 || load1 <= LoadFraction * cores
    val sentinelOk = sentinelSec <= SentinelSlack * idleSentinelSec
    loadOk && sentinelOk
  }

  /** Was the box quiet DURING the tier that just finished? Sentinel
    * only: the 1-min loadavg right after a tier is dominated by the
    * tier's own 32-thread work (observed: clean runs end at load
    * 11-13 with a 0.2 s sentinel) and takes minutes to decay, so it
    * cannot distinguish self-load from a competitor. The sentinel can:
    * it needs every core NOW, and an external storm inflates it (r6's
    * poisoned artifact probed 0.661 s against a ~0.27 s idle).
    * Loadavg is still recorded in the JSON for forensics.
    */
  def quietPost(sentinelSec: Double,
                idleSentinelSec: Double = DefaultIdleSentinelSec): Boolean =
    sentinelSec <= SentinelSlack * idleSentinelSec

  /** Cross-tier physical-sanity check: the same query over strictly
    * more data cannot be faster beyond noise, so `small > slack * big`
    * (with both times above the scheduling-floor `floorSec`, where
    * jitter dominates) marks the SMALL tier's timing dirty — the r8
    * artifact shipped q_passage_dedup 0.72 s at sf0.1 vs 0.17 s at
    * sf10 under a `clean` stamp, which this would have caught.
    * Returns the offending query names.
    */
  def crossTierViolations(small: Seq[(String, Double)],
                          big: Seq[(String, Double)],
                          slack: Double = 1.5,
                          floorSec: Double = 0.3): Seq[String] = {
    val bigMap = big.toMap
    small.collect {
      case (q, ts) if ts > floorSec && bigMap.get(q).exists(tb =>
        tb >= 0 && ts > slack * tb) => q
    }
  }

  /** Cross-ROUND per-query tripwire (r11 verdict item 1): a query
    * measuring more than `factor`× its best committed prior-artifact
    * time at the SAME tier is treated like a hot closing sentinel —
    * re-run once, and if the re-run still trips, kept but marked
    * dirty (named in the tier's `prior_outliers`). The r11 driver run
    * shipped q_token_count at 2.389 s against a same-day committed
    * 0.235 s (8×, box noise) inside a `contended:false` artifact —
    * every existing guard passed because the blip fit between two
    * quiet sentinels. A genuine plan change that slows a query >3×
    * also trips this, which is correct: it should be re-baselined
    * deliberately, with the dirty mark as the prompt, not ship as a
    * silent regression. `floorSec` skips the sub-0.3 s scheduling-
    * jitter regime (same bound as [[crossTierViolations]]); a query
    * with no prior record (newborn operators) never trips.
    */
  val PriorFactor = 3.0
  def priorOutlier(sec: Double, prior: Option[Double],
                   factor: Double = PriorFactor,
                   floorSec: Double = 0.3): Boolean =
    sec > floorSec && prior.exists(p => p > 0 && sec > factor * p)

}
