package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ingest-drift monitoring between two corpus snapshots: Population
  * Stability Index over fixed equi-width buckets plus the bucketed
  * KS sup-difference — the "did this month's crawl change shape"
  * check a continuously-fed training pipeline runs before letting a
  * new dump into the mix (the scorecard-monitoring PSI convention:
  * <0.1 stable, 0.1–0.25 drifting, >0.25 shifted).
  *
  * Bucket edges are fixed by the REFERENCE snapshot's min/max (the
  * convention that makes week-over-week numbers comparable); current
  * values outside the reference range clamp into the edge buckets.
  * Empty buckets are Laplace-smoothed (+0.5 per bucket) so PSI stays
  * finite — smoothing is applied to BOTH snapshots identically over
  * the same dense bucket spine, so a no-drift pair still scores ~0.
  *
  * Scale design: the reference range is ONE 2-value aggregate
  * broadcast into both scans; bucket assignment is a narrow in-scan
  * expression; each snapshot then pays exactly one bucket-keyed
  * exchange whose reducer input is `buckets` rows (map-side partial
  * counts) — two corpus scans, two B-row exchanges, nothing keyed by
  * document. Everything downstream of the counts is O(buckets) rows:
  * driver-safe, joinable, cheap to persist next to the snapshot.
  *
  * Determinism: bucket ids are integer floors of one IEEE division;
  * fractions and ln terms are floor(x·1e4+0.5)/1e4-rounded (the
  * cross-engine rounding protocol); the KS sup is a max over exact
  * integer cumulative counts scaled once per side.
  */
object Drift {

  private def r4(c: Column): Column = floor(c * 1e4 + lit(0.5)) / 1e4

  /** Smoothed per-bucket counts/fractions of both snapshots on the
    * reference-anchored spine, with each bucket's raw PSI term —
    * (bucket, ref_count, cur_count, p, q) before rounding.
    */
  private def bucketTerms(ref: DataFrame, cur: DataFrame,
                          valueCol: String, buckets: Int): DataFrame = {
    require(buckets >= 2, s"need >=2 buckets, got $buckets")
    val v = col(valueCol).cast("double")
    // one 2-value aggregate fixes the edges; broadcast into both scans
    val range = ref.agg(min(v).as("lo"), max(v).as("hi"))
    val counts = (df: DataFrame) => df
      .crossJoin(broadcast(range))
      .select(greatest(lit(0), least(lit(buckets - 1),
        when(col("hi") === col("lo"), lit(0)).otherwise(
          floor((v - col("lo")) / ((col("hi") - col("lo")) / buckets)).cast("int"))))
        .as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

    // dense bucket spine so empty buckets exist on both sides
    val spark = ref.sparkSession
    import spark.implicits._
    val spine = (0 until buckets).toDF("bucket")
    val joined = spine
      .join(counts(ref).withColumnRenamed("cnt", "ref_count"), Seq("bucket"), "left")
      .join(counts(cur).withColumnRenamed("cnt", "cur_count"), Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("ref_count"), lit(0L)).as("ref_count"),
        coalesce(col("cur_count"), lit(0L)).as("cur_count"))

    // Laplace-smoothed fractions; the smoothed denominator (N + 0.5·B)
    // keeps each side's fractions summing to exactly 1. Totals come
    // from an unpartitioned window over the B-row frame — NOT a
    // separate aggregate branch, which would duplicate the whole
    // corpus-count subtree into a crossJoin (B is `buckets` rows; an
    // unpartitioned window over it is constant work)
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    joined
      .withColumn("ref_n", sum(col("ref_count")).over(wAll))
      .withColumn("cur_n", sum(col("cur_count")).over(wAll))
      .withColumn("p", (col("ref_count") + lit(0.5)) / (col("ref_n") + lit(0.5) * buckets))
      .withColumn("q", (col("cur_count") + lit(0.5)) / (col("cur_n") + lit(0.5) * buckets))
  }

  /** Per-bucket drift table: (bucket, ref_count, cur_count, ref_frac,
    * cur_frac, psi_term) with psi_term = (p−q)·ln(p/q), all 4-dp.
    */
  def psiTable(ref: DataFrame, cur: DataFrame, valueCol: String, buckets: Int): DataFrame =
    bucketTerms(ref, cur, valueCol, buckets)
      .select(col("bucket").cast("long").as("bucket"),
        col("ref_count"), col("cur_count"),
        r4(col("p")).as("ref_frac"), r4(col("q")).as("cur_frac"),
        r4((col("p") - col("q")) * log(col("p") / col("q"))).as("psi_term"))

  /** One-row drift verdict: (ref_n, cur_n, psi, ks, drifted) where
    * `ks` is the bucketed sup |cdf_ref − cdf_cur| and `drifted`
    * applies the given PSI threshold (default 0.25 = "shifted").
    */
  def summary(ref: DataFrame, cur: DataFrame, valueCol: String, buckets: Int,
              threshold: Double = 0.25): DataFrame = {
    val w = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketTerms(ref, cur, valueCol, buckets)
      .withColumn("ref_cum", sum(col("ref_count")).over(w))
      .withColumn("cur_cum", sum(col("cur_count")).over(w))
      .agg(max(col("ref_n")).as("ref_n"), max(col("cur_n")).as("cur_n"),
        sum((col("p") - col("q")) * log(col("p") / col("q"))).as("psi_raw"),
        max(abs(col("ref_cum").cast("double") / col("ref_n")
          - col("cur_cum").cast("double") / col("cur_n"))).as("ks_raw"))
      .select(col("ref_n"), col("cur_n"),
        r4(col("psi_raw")).as("psi"), r4(col("ks_raw")).as("ks"),
        (col("psi_raw") > threshold).as("drifted"))
  }
}
