package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RN-003: categorical value normalization (trim + uppercase).
  *
  * Reference: src/silver/job-silver-rues.py:360-373. Narrow
  * projection; codegen'd; free at scale.
  */
object Normalizer {

  def normalizeValue(c: Column): Column = upper(trim(c))

  def normalize(df: DataFrame, cols: Seq[String]): DataFrame = {
    val target = cols.filter(df.columns.contains).toSet
    val out = df.columns.map { c =>
      if (target(c)) normalizeValue(col(c)).as(c) else col(c)
    }
    df.select(out.toIndexedSeq: _*)
  }

  /** Winsorization (quantile clipping) of a numeric column: values
    * below the pLo / above the pHi percentile clamp to the bound —
    * the standard outlier treatment before ML feature extraction.
    *
    * One stats aggregation (a 1-row broadcast) + a narrow clamp pass.
    * `exact = true` uses the exact interpolated `percentile` (its
    * state grows with distinct values — fine to sf0.1, and it is what
    * a DuckDB `quantile_cont` oracle can reproduce); production at
    * 100 TB flips to `approx_percentile`, whose t-digest state is
    * fixed-size and mergeable (same call shape). Bounds are rounded
    * to `dp` decimals BEFORE clamping so clipped rows carry an
    * engine-portable value.
    */
  def winsorize(df: DataFrame, valueCol: String, pLo: Double, pHi: Double,
                exact: Boolean = true, dp: Int = 2): DataFrame = {
    val fn = if (exact) "percentile" else "approx_percentile"
    val f = math.pow(10, dp)
    val bounds = df
      .agg(expr(s"$fn(`$valueCol`, array($pLo, $pHi))").as("b"))
      .select(
        (floor(element_at(col("b"), 1) * lit(f) + lit(0.5)) / lit(f)).as("__lo"),
        (floor(element_at(col("b"), 2) * lit(f) + lit(0.5)) / lit(f)).as("__hi"))
    df.crossJoin(broadcast(bounds))
      .withColumn(s"${valueCol}_w",
        least(greatest(col(valueCol), col("__lo")), col("__hi")))
      .withColumn("__clipped",
        when(col(valueCol) < col("__lo"), lit(-1L))
          .when(col(valueCol) > col("__hi"), lit(1L)).otherwise(lit(0L)))
      .drop("__lo", "__hi")
  }

  /** Rank-exact winsorization over cent-scaled longs. The bound at
    * percentile p is the actual data value at 0-indexed rank
    * floor(p*(n-1)) — no interpolation, so any two engines sorting the
    * same integers pick bit-identical bounds (the interpolated form
    * above differs cross-engine in the final ulp of `percentile` vs
    * `quantile_cont` and can flake a value-hash gate at a .005
    * boundary; q_group_percentiles applies the same rank rule).
    *
    * Scale shape: ranks are located on the VALUE HISTOGRAM (groupBy
    * cent-value, running count over distinct values) — the
    * unpartitioned window runs over |distinct values| rows, never a
    * corpus-wide row_number. Adds `<valueCol>_wc` (clamped cents,
    * long) and `__clipped` (-1/0/1).
    */
  def winsorizeCentRank(df: DataFrame, valueCol: String,
                        pLo: Double, pHi: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = floor(col(valueCol) * lit(100.0) + lit(0.5)).cast("long")
    val hist = df.select(cents.as("__c"))
      .groupBy("__c").agg(count(lit(1)).as("__n"))
    val cum = hist.select(col("__c"),
      sum("__n").over(Window.orderBy("__c")).as("__cum"),
      sum("__n").over(Window.partitionBy()).as("__tot"))
    // value at 0-indexed rank k = smallest v with cum(v) >= k + 1
    val bounds = cum.agg(
      min(when(col("__cum") - 1 >= floor(lit(pLo) * (col("__tot") - 1)), col("__c")))
        .as("__lo_c"),
      min(when(col("__cum") - 1 >= floor(lit(pHi) * (col("__tot") - 1)), col("__c")))
        .as("__hi_c"))
    df.withColumn("__c", cents)
      .crossJoin(broadcast(bounds))
      .withColumn(s"${valueCol}_wc",
        least(greatest(col("__c"), col("__lo_c")), col("__hi_c")))
      .withColumn("__clipped",
        when(col("__c") < col("__lo_c"), lit(-1L))
          .when(col("__c") > col("__hi_c"), lit(1L)).otherwise(lit(0L)))
      .drop("__c", "__lo_c", "__hi_c")
  }
}
