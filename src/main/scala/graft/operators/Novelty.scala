package graft.operators

import graft.functions.Rounding.pround
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-gram novelty scoring against a reference corpus — the
  * memorization/recombination diagnostic (Lee et al. 2022; McCoy et
  * al. 2023 "raven" analyses): for each candidate document, what
  * fraction of its distinct k-grams never occurs in the reference?
  * Low novelty flags near-copies and templated regurgitation of the
  * reference distribution; high novelty flags out-of-distribution
  * (or gibberish) text. The same machinery, run with the TEST set as
  * reference, is the contamination direction [[graft.pipeline.Decontaminate]]
  * covers; here the reference is the training corpus and the output
  * is a per-document score, not a drop verdict.
  *
  * Scale shape (the decontaminate/exact-dedup discipline):
  *  - per-doc k-grams are `array_distinct`-ed INSIDE the row before
  *    the explode, so a repetitive document cannot fan out (novelty
  *    is set-based, so this also is the semantics);
  *  - the reference's distinct k-gram set is ONE shingle-keyed
  *    exchange (partial-aggregated distinct);
  *  - the membership probe is a shingle-keyed LEFT ANTI join — the
  *    only corpus-sized exchange pair; at 100 TB both sides shuffle
  *    once on the same key (AQE broadcasts the reference side when a
  *    small held-out slice is the reference);
  *  - per-doc totals ride narrow (`size` of the distinct array), so
  *    the doc-keyed aggregate and the final join carry counts only.
  */
object Novelty {

  /** Per-candidate report: (id, n_grams, n_novel, novelty 4dp) where
    * `n_grams` counts DISTINCT k-grams of the candidate, `n_novel`
    * those absent from `reference`, and novelty = n_novel/n_grams
    * (0.0 for docs with no k-gram, portable floor-rounding). K-gram
    * convention is [[TF.shingles]]: texts of ≤ k tokens contribute
    * their whole text as one shingle.
    */
  def report(candidates: DataFrame, reference: DataFrame, idCol: String,
             textCol: String, k: Int): DataFrame = {
    // TF.shingles already returns the DISTINCT k-gram set per doc
    val withSh = candidates.select(col(idCol),
      TF.shingles(col(textCol), k).as("__shs"))
    val totals = withSh.select(col(idCol),
      size(col("__shs")).cast("long").as("n_grams"))
    val pairs = withSh.select(col(idCol), explode(col("__shs")).as("__sh"))
    val refSet = reference
      .select(explode(TF.shingles(col(textCol), k)).as("__sh"))
      .distinct()
    val novel = pairs.join(refSet, Seq("__sh"), "left_anti")
      .groupBy(idCol).agg(count(lit(1)).as("n_novel"))
    totals.join(novel, Seq(idCol), "left")
      .select(col(idCol), col("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty",
        when(col("n_grams") === 0L, lit(0.0)).otherwise(
          pround(col("n_novel").cast("double") / col("n_grams"), 4)))
  }
}
