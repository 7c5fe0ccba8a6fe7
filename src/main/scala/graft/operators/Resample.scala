package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-series regularization: bucket events to a fixed grain and
  * fill the gaps, so every key carries a dense, gap-free series —
  * what windowed feature extraction and sequence-model training data
  * need (a missing hour must be an explicit zero row, not an absent
  * one).
  *
  * Shape at scale: one aggregation to the grain, one tiny per-key
  * min/max aggregation, and a `sequence`+`explode` that generates
  * each key's grid INSIDE its partition — the dense grid never
  * shuffles; the left join back to the buckets is keyed (key, bucket)
  * and AQE-broadcastable when the bucketed side is small. Nothing is
  * ever driver-side.
  */
object Resample {

  /** Per-key dense series at `grain` granularity (hour/day/minute)
    * over each key's own [min, max] bucket span. Output: keyCols +
    * `bucket` + `n` (0 for gap rows) + `sum_value` (0.0 for gap rows).
    */
  def gapFill(df: DataFrame, keyCols: Seq[String], tsCol: String,
              valueCol: String, grain: String = "hour"): DataFrame = {
    val key = keyCols.map(col)
    val buckets = df
      .groupBy(key :+ date_trunc(grain, col(tsCol)).as("bucket"): _*)
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("sum_value"))
    val grid = buckets
      .groupBy(key: _*)
      .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
      .select(key :+ explode(sequence(col("b0"), col("b1"),
        expr(s"INTERVAL 1 $grain"))).as("bucket"): _*)
    grid.join(buckets, keyCols :+ "bucket", "left")
      .select(key ++ Seq(col("bucket"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value")): _*)
  }
}
