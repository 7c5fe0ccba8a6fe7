package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: each left row picks the most recent
  * right row with rightTime <= leftTime for the same key — the
  * canonical operator for "state as of event time" that Spark lacks
  * natively.
  *
  * Implemented as the union-sort composition rather than a custom
  * SparkPlan: tag both sides, sort each key's timeline once, and
  * carry the latest right payload forward with
  * `last(..., ignoreNulls)` over an unbounded-preceding window. Cost
  * is ONE shuffle + sort on the key — the same lower bound a native
  * as-of merge join would pay — and every step is a built-in
  * (codegen'd, AQE-planned), so it inherits skew handling for free.
  *
  * Ties (right row exactly at leftTime) match, mirroring standard
  * ASOF semantics (DuckDB/QuestDB/kdb): the right side sorts before
  * the left at equal timestamps.
  *
  * The right side should be unique per (key, time) — pre-reduce with
  * e.g. Deduplicator.latestWinsAgg if it isn't, or the picked row is
  * tie-ambiguous (as in every ASOF implementation).
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           rightPayload: Seq[String]): DataFrame = {
    val lCols = left.columns.toSeq
    // a NULL right time would sort to the head of every key's timeline
    // and match everything after it; ASOF semantics (and DuckDB's
    // implementation) never match NULL-timed rows, so drop them
    val rightValid = right.filter(col(rightTime).isNotNull)
    val l = left.select(
      col(leftKey).as("__k"), col(leftTime).as("__t"), lit(1).as("__side"),
      struct(lCols.map(col): _*).as("__l"),
      lit(null).cast(structType(right, rightPayload)).as("__r"))
    val r = rightValid.select(
      col(rightKey).as("__k"), col(rightTime).as("__t"), lit(0).as("__side"),
      lit(null).cast(structType(left, lCols)).as("__l"),
      struct(rightPayload.map(col): _*).as("__r"))
    val w = Window.partitionBy("__k")
      .orderBy(col("__t").asc_nulls_first, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__picked", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(lCols.map(c => col(s"__l.`$c`").as(c)) ++
        rightPayload.map(c => col(s"__picked.`$c`").as(c)): _*)
  }

  /** FORWARD as-of: each left row picks the EARLIEST right row with
    * rightTime >= leftTime for the same key ("the next maintenance
    * event after each reading"). Same union-sort shape as [[asOf]]
    * with the carry direction reversed: the timeline sorts ascending
    * and the next right payload is carried BACKWARD with
    * `first(..., ignoreNulls)` over an unbounded-FOLLOWING window —
    * still one shuffle + one sort. Ties match (right sorts after left
    * at equal time via the side tag, and the first-following pick
    * includes the current row).
    */
  def asOfForward(left: DataFrame, right: DataFrame,
                  leftKey: String, rightKey: String,
                  leftTime: String, rightTime: String,
                  rightPayload: Seq[String]): DataFrame = {
    val lCols = left.columns.toSeq
    val rightValid = right.filter(col(rightTime).isNotNull)
    val l = left.select(
      col(leftKey).as("__k"), col(leftTime).as("__t"), lit(0).as("__side"),
      struct(lCols.map(col): _*).as("__l"),
      lit(null).cast(structType(right, rightPayload)).as("__r"))
    val r = rightValid.select(
      col(rightKey).as("__k"), col(rightTime).as("__t"), lit(1).as("__side"),
      lit(null).cast(structType(left, lCols)).as("__l"),
      struct(rightPayload.map(col): _*).as("__r"))
    val w = Window.partitionBy("__k")
      .orderBy(col("__t").asc_nulls_last, col("__side").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    l.unionByName(r)
      .withColumn("__picked", first(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .select(lCols.map(c => col(s"__l.`$c`").as(c)) ++
        rightPayload.map(c => col(s"__picked.`$c`").as(c)): _*)
  }

  private def structType(df: DataFrame, cols: Seq[String]) =
    org.apache.spark.sql.types.StructType(
      cols.map(c => df.schema(c)))
}
