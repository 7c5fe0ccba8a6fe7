package graft.pipeline

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share word
  * k-shingles with an evaluation corpus, the standard pre-training
  * hygiene pass (an eval question leaking into the training set
  * invalidates the benchmark).
  *
  * Shape: the EVAL side is tiny (benchmark suites are thousands of
  * documents, the training corpus is the 100 TB side), so the eval
  * shingle set deduplicates to a broadcastable dimension and the
  * training corpus takes exactly one narrow shingling pass plus a
  * broadcast-hash semi-join — the big side is never shuffled by
  * shingle. The only exchange is the per-doc hit-count aggregation,
  * keyed by doc id with map-side partial aggregation, carrying two
  * longs per doc.
  */
object Decontaminate {

  /** Distinct word-k-shingles of the eval corpus (the broadcast side). */
  def evalShingles(eval: DataFrame, textCol: String, k: Int): DataFrame =
    eval.select(explode(TextFunctions.shingles(col(textCol), k)).as("shingle"))
      .distinct()

  /** Per-training-doc contamination stats: shingle count, eval-shingle
    * hits, hit fraction, and a boolean flag at `threshold`. Every
    * training row is preserved (zero-shingle docs report 0.0).
    */
  def stats(train: DataFrame, eval: DataFrame, idCol: String, textCol: String,
            k: Int = 3, threshold: Double = 0.5): DataFrame = {
    val n = train.sparkSession.sparkContext.defaultParallelism
    // repartition the RAW text before the shingle expression so the
    // per-row regex work parallelizes even off a few-task scan
    val idx = train.select(col(idCol).as("doc_id"), col(textCol).as("__text"))
      .repartition(n)
      .select(col("doc_id"), TextFunctions.shingles(col("__text"), k).as("sh"))
      .select(col("doc_id"), size(col("sh")).cast("long").as("n_shingles"),
        explode(col("sh")).as("shingle"))
    val hits = idx
      .join(broadcast(evalShingles(eval, textCol, k)), Seq("shingle"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
    train.select(col(idCol).as("doc_id"),
        size(TextFunctions.shingles(col(textCol), k)).cast("long").as("n_shingles"))
      .join(hits, Seq("doc_id"), "left")
      .na.fill(Map("n_hit" -> 0L))
      .withColumn("contamination",
        when(col("n_shingles") === 0, lit(0.0)).otherwise(
          // floor(x*1e4+0.5)/1e4: bit-identical across engines (vs round)
          floor(col("n_hit").cast("double") / col("n_shingles").cast("double")
            * lit(10000.0) + lit(0.5)) / lit(10000.0)))
      // BIGINT 1/0 flag, not boolean: matches the repo's cross-engine
      // compare convention for flags (see StarSchema.flag_vencido)
      .withColumn("contaminated",
        when(col("contamination") >= threshold, lit(1L)).otherwise(lit(0L)))
  }

  /** The cleaned training corpus: rows whose contamination stays under
    * `threshold`. One extra broadcastable join against the flagged-id
    * list would also work; filtering the stats output keeps it one plan.
    */
  def clean(train: DataFrame, eval: DataFrame, idCol: String, textCol: String,
            k: Int = 3, threshold: Double = 0.5): DataFrame =
    train.join(
      stats(train, eval, idCol, textCol, k, threshold)
        .filter(col("contaminated") === 0L).select(col("doc_id").as(idCol)),
      Seq(idCol), "left_semi")
}
