package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-event analytics: conversion funnels and cohort retention —
  * the behavioral queries an events table exists to answer.
  *
  * Shape at scale:
  *  - each funnel stage is `min(ts)` per user over a type-filtered
  *    scan (pushed predicate) joined to the previous stage — all
  *    partial-aggregated, FIXED-SIZE state per user. The tempting
  *    single-pass form (collect each user's event array, walk it with
  *    HOFs) buffers a power user's full history in one aggregation
  *    buffer — the same unbounded-reducer trap as uncapped
  *    `collect_list` buckets, so it is deliberately not used here;
  *  - each stage's frame shrinks (only converting users survive), so
  *    later joins are cheaper and AQE broadcasts them;
  *  - cohort retention is one `min`-per-user pass (first-seen week)
  *    joined back to the events and re-aggregated on
  *    (cohort_week, offset) — two shuffles total, both partial-agg'd.
  */
object Funnel {

  private def pround = graft.functions.Rounding.pround _

  /** Strictly-ordered funnel: for each step i, the user's earliest
    * step-i event AFTER their step-(i-1) time. Returns one row per
    * step: (step, n_users, conv_pct from step 1, 4 dp).
    *
    * Fully LAZY: the per-step counts are a union of 1-row aggregates
    * over the chained stage plans — building the DataFrame runs zero
    * jobs (eager per-stage `.count()` actions would fire N+1 jobs on
    * mere construction). The union's branches share identical stage
    * subtrees, so Catalyst's ReuseExchange collapses the repeated
    * stage shuffles — the union costs one pass per stage, not N²/2.
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    def stepCount(label: String, stage: DataFrame): DataFrame =
      stage.agg(count(lit(1)).as("n_users")).select(lit(label).as("step"), col("n_users"))
    var stage = events.filter(col(typeCol) === steps.head)
      .groupBy(userCol).agg(min(col(tsCol)).as("t_prev"))
    var label = steps.head
    var branches = Vector(stepCount(label, stage))
    for (s <- steps.tail) {
      stage = events.filter(col(typeCol) === s)
        .join(stage, Seq(userCol))
        .filter(col(tsCol) > col("t_prev"))
        .groupBy(userCol).agg(min(col(tsCol)).as("t_prev"))
      label = label + ">" + s
      branches :+= stepCount(label, stage)
    }
    val base = branches.head.select(col("n_users").as("__base"))
    branches.reduce(_ unionAll _)
      .crossJoin(broadcast(base))
      .withColumn("conv_pct", when(col("__base") === 0, lit(0.0)).otherwise(
        pround(col("n_users") * lit(100.0) / col("__base"), 4)))
      .drop("__base")
  }

  /** Weekly cohort retention: users grouped by first-seen week; one
    * row per (cohort_week, week_offset) with the distinct users active
    * that week. Weeks are Monday-truncated (ISO) in every engine.
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val firstSeen = events.groupBy(userCol)
      .agg(date_trunc("week", min(col(tsCol))).cast("date").as("cohort_week"))
    events
      .select(col(userCol), date_trunc("week", col(tsCol)).cast("date").as("activity_week"))
      .join(firstSeen, Seq(userCol))
      // both weeks are Monday-truncated, so the day gap is an exact
      // multiple of 7 and the double division casts back losslessly
      .groupBy(col("cohort_week"),
        (datediff(col("activity_week"), col("cohort_week")) / 7).cast("long")
          .as("week_offset"))
      .agg(count_distinct(col(userCol)).as("n_users"))
      .select(date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"), col("n_users"))
  }
}
