package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted mergeable value-HISTOGRAM store — the quantile analog of
  * [[SketchStore]]: where the HLL store answers "distinct keys per
  * partition / overall, forever, without rescanning", this answers
  * "value distribution and any percentile per partition, forever,
  * without rescanning". Each arriving partition is folded ONCE into
  * fixed-width integer buckets; the persisted (part, bucket, n) rows
  * merge by pure count ADDITION — exact, associative, retry-safe (no
  * sketch approximation anywhere in the store itself; the only error
  * is the a-priori bucket width, so a percentile read is within one
  * bucket of exact, a bound that holds after any number of merges).
  *
  * Scale design: building is one partition-keyed exchange with
  * map-side combine (buckets per group, not rows); the store is
  * O(parts x value-range/width) rows; estimates run a window over the
  * per-part bucket rows (bounded by the histogram, never the data).
  */
object HistStore {

  /** One row per (partCol, bucket): row count in
    * [bucket*width, (bucket+1)*width) over the integerized value.
    */
  def build(df: DataFrame, partCol: String, intValue: Column,
            width: Long): DataFrame =
    df.groupBy(col(partCol), floor(intValue / width).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))

  /** Merge a store with a delta store: counts ADD — exact at any
    * merge depth, O(|store| + |delta|) histogram rows.
    */
  def mergeIncremental(store: DataFrame, delta: DataFrame,
                       partCol: String): DataFrame =
    store.unionByName(delta)
      .groupBy(col(partCol), col("bucket"))
      .agg(sum(col("n")).as("n"))

  /** Percentile estimates from a store: for each part and each p, the
    * midpoint of the bucket holding rank floor(p*(n-1)) — within one
    * bucket width of the exact value by construction. Output:
    * (partCol, p, est_int) with est_int on the integerized scale.
    */
  def percentileEstimates(store: DataFrame, partCol: String,
                          ps: Seq[Double], width: Long): DataFrame = {
    val w = Window.partitionBy(partCol).orderBy("bucket")
    val cum = store
      .withColumn("hi", sum(col("n")).over(w))
      .withColumn("lo", col("hi") - col("n"))
      .withColumn("total", sum(col("n")).over(Window.partitionBy(partCol)))
    ps.map { p =>
      cum.filter(col("lo") <= floor(lit(p) * (col("total") - 1)) &&
          floor(lit(p) * (col("total") - 1)) < col("hi"))
        .select(col(partCol), lit(p).as("p"),
          (col("bucket") * width + width / 2).as("est_int"))
    }.reduce(_ unionAll _)
  }
}
