package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view update
  * path: keep a per-key aggregate table current under appends WITHOUT
  * rescanning history. The trick is storing the aggregate in its
  * mergeable partial form (n, sum, min, max — and mean/avg derived,
  * never stored): new rows aggregate to partials, and partials merge
  * with the standing state by the same commutative ops Spark's own
  * partial aggregation uses.
  *
  * At 100 TB this is the difference between an O(delta) nightly job
  * and an O(history) one. Algebraic aggregates only (count/sum/min/
  * max/mean); holistic ones (exact median) need the sketch path
  * (`Profiler.approxPercentiles` — mergeable by construction).
  */
object IncrementalAgg {

  /** Aggregate `rows` to the mergeable state form. */
  def toState(rows: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    rows.groupBy(keys.map(col): _*).agg(
      count(col(valueCol)).as("n"),
      sum(col(valueCol)).as("sum"),
      min(col(valueCol)).as("min"),
      max(col(valueCol)).as("max"))

  /** Merge new rows into standing state: one aggregation over the
    * delta plus a union-reaggregate of two tiny state tables — the
    * history rows are never touched.
    */
  def merge(state: DataFrame, newRows: DataFrame, keys: Seq[String],
            valueCol: String): DataFrame =
    state.unionByName(toState(newRows, keys, valueCol))
      .groupBy(keys.map(col): _*).agg(
        sum(col("n")).as("n"),
        sum(col("sum")).as("sum"),
        min(col("min")).as("min"),
        max(col("max")).as("max"))

  /** Read-side view with derived (non-stored) aggregates. */
  def withDerived(state: DataFrame): DataFrame =
    state.withColumn("mean", col("sum") / col("n"))
}
