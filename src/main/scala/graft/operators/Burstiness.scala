package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Rounding.pround

/** Inter-event burstiness per key — the bot/automation screen for
  * event and crawl logs: humans are bursty (inter-arrival gaps with
  * coefficient of variation ≈ 1, the Poisson signature, or above),
  * schedulers and scrapers are REGULAR (CV → 0). Flagging regular
  * keys is the standard first pass before rate-limiting or excluding
  * machine traffic from engagement-derived training signals.
  *
  * Determinism: gaps are second-floored integer differences of epoch
  * micros (a CONSTANT session-TZ offset cancels in the subtraction,
  * so the NTZ→LTZ cast is safe), and mean/CV derive from exact
  * integer moment sums — the [[graft.ann.Standardize]] rule. One key
  * shuffle; the lag and the aggregate share its sort.
  */
object Burstiness {

  /** Per-key report over keys with at least `minGaps` gaps:
    * (key, n_gaps, mean_gap_s 2dp, cv 4dp, bot_like = cv below
    * `cvBelow` on the ROUNDED value). `idCol` totally orders ties —
    * the gap SUM telescopes (order-free) but the square sum does
    * not, so the sort must be deterministic.
    */
  def report(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      minGaps: Int = 8, cvBelow: Double = 0.3): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(idCol))
    val sec = floor(unix_micros(col(tsCol).cast("timestamp_ltz"))
      / lit(1000000L)).cast("long")
    val gaps = df
      .select(col(keyCol), col(tsCol), col(idCol), sec.as("s"))
      .withColumn("gap", col("s") - lag(col("s"), 1).over(w))
      .filter(col("gap").isNotNull)
    val agg = gaps.groupBy(keyCol).agg(
      count(lit(1)).as("n_gaps"),
      sum(col("gap")).as("sg"),
      sum((col("gap") * col("gap")).cast("decimal(38,0)")).as("qg"))
    val mean = agg("sg").cast("double") / agg("n_gaps")
    val variance = (agg("qg").cast("double") -
      agg("sg").cast("double") * agg("sg") / agg("n_gaps")) / agg("n_gaps")
    val cv = pround(when(mean === 0.0, lit(0.0))
      .otherwise(sqrt(variance) / mean), 4)
    agg.filter(col("n_gaps") >= minGaps)
      .select(col(keyCol), col("n_gaps"),
        pround(mean, 2).as("mean_gap_s"),
        cv.as("cv"),
        (cv < cvBelow).as("bot_like"))
  }
}
