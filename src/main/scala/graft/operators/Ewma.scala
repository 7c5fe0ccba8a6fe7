package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exponentially-weighted moving average over per-key daily series,
  * with a relative-jump spike flag — the streaming-metrics smoother
  * ops dashboards run on ingest volumes (EWMA reacts to level shifts
  * faster than a fixed window and needs O(1) state per key, which is
  * why it is THE incremental-monitoring primitive).
  *
  * Exactness design: alpha is pinned to 1/2, so the recursion
  * y_i = (y_{i-1} + x_i) * 0.5 performs one IEEE add and one EXACT
  * power-of-two scale per step, in day order, in every engine —
  * DuckDB's recursive CTE replays it bit-for-bit (same ops, same
  * order, same doubles), giving the gate a full value oracle where a
  * general alpha's differing fp association would flake. General
  * alpha is a parameter for library callers; only the oracle pins 1/2.
  *
  * Scale design: ONE exchange — the daily partial aggregate (map-side
  * combine collapses each task to |keys|x|days| rows). The per-key
  * series is then a bounded array (days, not data), folded with
  * higher-order aggregates: the i-th running value re-folds the
  * prefix, O(days^2) arithmetic on a report-sized frame, zero
  * further shuffles, no driver collect. The window-free form matters:
  * a running EWMA via window functions would need a SCAN primitive
  * Spark lacks, and a mapGroups escape hatch would leave codegen.
  */
object Ewma {

  /** (key, day, n, ewma, spike) per day: ewma with alpha=1/2 over the
    * day-ordered daily counts of `df` grouped by `keyCol`; spike when
    * the day's count departs from yesterday's smoothed level by more
    * than `jump` relative (first day never flags).
    */
  def dailySpikes(df: DataFrame, keyCol: String, tsCol: String,
                  jump: Double = 0.5): DataFrame = {
    val daily = df
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"))
    val series = daily.groupBy(keyCol)
      .agg(sort_array(collect_list(struct(col("day"), col("n")))).as("__s"))
    // prefix fold: acc < 0 is the "unseeded" sentinel (counts are
    // >= 0), so the first element seeds y_1 = x_1 exactly
    def foldPrefix(len: Column): Column =
      aggregate(slice(col("__s"), lit(1), len), lit(-1.0),
        (acc, e) => when(acc < 0, e.getField("n").cast("double"))
          .otherwise((acc + e.getField("n").cast("double")) * lit(0.5)))
    series
      .select(col(keyCol), col("__s"), posexplode(col("__s")).as(Seq("__i", "__e")))
      .withColumn("__ewma", foldPrefix(col("__i") + lit(1)))
      .withColumn("__prev", when(col("__i") > 0, foldPrefix(col("__i"))))
      .select(col(keyCol),
        date_format(col("__e.day"), "yyyy-MM-dd").as("day"),
        col("__e.n").as("n"),
        floor(col("__ewma") * lit(10000.0) + lit(0.5)).cast("double")
          .divide(lit(10000.0)).as("ewma"),
        coalesce(
          abs(col("__e.n").cast("double") - col("__prev")) >
            lit(jump) * col("__prev"),
          lit(false)).as("spike"))
  }
}
