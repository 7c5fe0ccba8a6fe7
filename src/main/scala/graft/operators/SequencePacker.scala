package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining batches: assign documents (in a
  * deterministic order) to consecutive fixed-token-budget bins — the
  * document-level approximation of sample packing (no splitting; a
  * document straddling a boundary spills into the next bin).
  *
  * The running token total is a PREFIX SUM over the global document
  * order — the one operation that naively plans as an unpartitioned
  * Window funneling the corpus through a single task. This
  * implementation is the textbook two-level distributed scan instead:
  *   1. per-group cumulative sums (keyed window, parallel),
  *   2. tiny per-group totals → cumulative group offsets (the only
  *      serial step, over n_groups rows, via broadcast join),
  *   3. global position = group offset + local cumsum (narrow).
  * The only partition-less window runs over the n_groups aggregated
  * rows, never the corpus — PlanSpec asserts the doc-ordered window
  * is keyed.
  */
object SequencePacker {

  /** `groupExpr` must be monotone in the pack order (contiguous id
    * ranges map to contiguous groups) — e.g. floor(id / K) for dense
    * ids. Output: one row per doc with `bin`, plus position columns.
    */
  def pack(docs: DataFrame, idCol: String, tokenCol: String,
           budget: Long, groupExpr: Column): DataFrame = {
    require(budget > 0, s"token budget must be positive: $budget")
    val base = docs.select(col(idCol), col(tokenCol).cast("long").as("__tok"),
      groupExpr.cast("long").as("__g"))
    val local = base.withColumn("__local_cum",
      sum(col("__tok")).over(
        Window.partitionBy("__g").orderBy(idCol)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // serial step over n_groups rows only: cumulative offset per group
    val offsets = base.groupBy("__g").agg(sum(col("__tok")).as("__gtot"))
      .withColumn("__offset",
        coalesce(sum(col("__gtot")).over(
          Window.orderBy("__g")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)),
          lit(0L)))
      .drop("__gtot")
    // no forced broadcast: n_groups = n_docs / K, and a too-fine
    // groupExpr would make a broadcast hint collect millions of
    // offsets to the driver. AQE broadcasts when it is actually small;
    // choose K so n_groups stays ~1e4-1e6 (the group-offset window
    // above is the serial step and is sized by the same choice).
    local.join(offsets, "__g")
      .withColumn("__cum", col("__local_cum") + col("__offset"))
      .select(col(idCol), col("__tok").as("n_tokens"),
        col("__cum").as("cum_tokens"),
        // bin of this doc's START position (cum - tok) — straddlers
        // spill forward, bins stay ≤ budget in started-tokens terms
        floor((col("__cum") - col("__tok")).cast("double") / budget.toDouble)
          .cast("long").as("bin"))
  }

  /** Per-bin packing summary (docs, tokens, fill ratio). */
  def summary(packed: DataFrame, budget: Long): DataFrame =
    packed.groupBy("bin").agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_tokens")).as("total_tokens"),
      floor(sum(col("n_tokens")).cast("double") / budget.toDouble * 10000.0
        + lit(0.5)).cast("double").divide(10000.0).as("fill_ratio"))
}
