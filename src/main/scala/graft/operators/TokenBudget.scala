package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget corpus mixing: select documents until a global token
  * budget is hit, allocating the budget across sources in proportion
  * to each source's token mass — the "data mixture" step every
  * pretraining pipeline runs after filtering/dedup (each source gets
  * quota_s = floor(B · tokens_s / tokens_total); docs are drawn in a
  * deterministic hash order until the quota is crossed; the document
  * that crosses the boundary is INCLUDED, so every quota is met and
  * the overshoot is bounded by one document per source).
  *
  * Determinism: the draw order is [[Sampling.portableOrdering]] (md5
  * of id + salt — identical in any engine, stable under task retries,
  * unlike `rand()`), so the selected set is reproducible bit-for-bit
  * and the whole operator has a full DuckDB oracle. Quotas use
  * `floor(B · (tokens_s / tokens_total))`: one IEEE double divide +
  * multiply + floor, identical in both engines (the portable-rounding
  * precedent — no decimal widening, no HUGEINT).
  *
  * Scale shape: token totals are two partial-aggregated exchanges of
  * a few rows (one per source, one grand total — broadcast back).
  * The per-source prefix sum is the naive funnel (ONE task per
  * source at 100 TB when sources are few), so the selection runs the
  * same two-level distributed scan as [[SequencePacker.pack]]: the
  * md5 draw order is bucketed by its OWN first two hex digits — a
  * prefix, so (bucket, md5) order ≡ md5 order — giving 256-way
  * parallel local windows per source, per-(source,bucket) totals
  * cumulated into offsets (the only serial window, over
  * n_sources·256 rows), and prefix-before = offset + local prefix.
  * PlanSpec asserts no corpus-sized unpartitioned window survives.
  */
object TokenBudget {

  /** Selected docs: (doc id, source, n_tok). `budget` in tokens. */
  def select(docs: DataFrame, idCol: String, sourceCol: String,
             textCol: String, budget: Long, salt: Int = 0): DataFrame = {
    require(budget >= 0, s"token budget must be non-negative: $budget")
    val base = docs.select(col(idCol), col(sourceCol).as("__src"),
      TextFunctions.tokenCount(col(textCol)).as("n_tok"),
      Sampling.portableOrdering(idCol, salt).as("__ord"))
    // per-source quota: few-row aggs; the 1-row grand total joins by
    // broadcast (AQE) and the quota math is portable IEEE
    val bySrc = base.groupBy("__src").agg(sum(col("n_tok")).as("__src_tok"))
    val grand = bySrc.agg(sum(col("__src_tok")).as("__all_tok"))
    val quotas = bySrc.crossJoin(broadcast(grand))
      .select(col("__src"),
        floor(lit(budget.toDouble) * (col("__src_tok").cast("double") /
          col("__all_tok").cast("double"))).cast("long").as("__quota"))
    // two-level prefix sum in md5 order (bucket = md5 prefix):
    val bucketed = base.withColumn("__b", substring(col("__ord"), 1, 2))
    val localW = Window.partitionBy("__src", "__b")
      .orderBy(col("__ord"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val local = bucketed.withColumn("__local_before",
      coalesce(sum(col("n_tok")).over(localW), lit(0L)))
    // serial step over n_sources·256 rows only
    val offsets = bucketed.groupBy("__src", "__b")
      .agg(sum(col("n_tok")).as("__btot"))
      .withColumn("__offset",
        coalesce(sum(col("__btot")).over(
          Window.partitionBy("__src").orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)),
          lit(0L)))
      .drop("__btot")
    local.join(offsets, Seq("__src", "__b"))
      .join(broadcast(quotas), Seq("__src"))
      .filter(col("__offset") + col("__local_before") < col("__quota"))
      .select(col(idCol), col("__src").as(sourceCol), col("n_tok"))
  }

  /** Per-source mixing report on a selection: how close each quota
    * landed (docs kept, tokens kept). Overshoot ≤ one doc per source
    * by construction.
    */
  def report(selected: DataFrame, sourceCol: String): DataFrame =
    selected.groupBy(sourceCol).agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_tok")).as("kept_tokens"))
}
