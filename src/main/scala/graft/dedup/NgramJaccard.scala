package graft.dedup

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact n-gram Jaccard similarity via an inverted shingle index.
  *
  * Instead of any pairwise comparison, explode each document into its
  * distinct word-k-shingles, drop shingles whose document frequency
  * exceeds `maxDf` (stopword-like shingles contribute almost nothing
  * to Jaccard but dominate pair generation — the classic prefix/df
  * filter), then self-join the inverted index: pairs sharing a rare
  * shingle, counting shared shingles per pair in one aggregation.
  * Jaccard = |∩| / (|A| + |B| − |∩|).
  *
  * Scale: the only heavy shuffle is keyed by shingle; df-filtering
  * bounds each shingle's bucket to ≤ maxDf docs, so pair generation
  * is O(Σ df²) with df ≤ maxDf — tunable, never O(n²).
  */
object NgramJaccard {

  /** (doc_id, shingle) inverted index with per-doc set sizes. The raw
    * text is repartitioned BEFORE shingling so the per-doc expression
    * parallelizes even off a single-task scan.
    */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val n = docs.sparkSession.sparkContext.defaultParallelism
    docs.select(col(idCol).as("doc_id"), col(textCol).as("__text"))
      .repartition(n)
      .select(col("doc_id"), TextFunctions.shingles(col("__text"), k).as("sh"))
      .withColumn("set_size", size(col("sh")).cast("long"))
      .select(col("doc_id"), col("set_size"), explode(col("sh")).as("shingle"))
  }

  /** Pairs (id_a < id_b) with exact Jaccard ≥ threshold.
    *
    * One keyed aggregation per shingle collects its posting list
    * (capped at maxDf+1 so stopword-like shingles are dropped without
    * materializing their full postings); in-bucket pairs come from a
    * nested array transform — same shape as MinHashLSH/SimHash
    * candidate generation, replacing the window-count + self-join.
    */
  def pairs(docs: DataFrame, idCol: String, textCol: String,
            k: Int = 3, threshold: Double = 0.3, maxDf: Int = 50): DataFrame = {
    val idx = invertedIndex(docs, idCol, textCol, k)
    val buckets = idx
      .groupBy("shingle")
      // bounded-buffer collect: a stopword-like shingle's posting list
      // is dropped by the size filter AND never exceeds maxDf+1 slots
      // in the aggregation buffer (native CollectMinK)
      .agg(call_function("collect_min_k",
        struct(col("doc_id"), col("set_size")), lit(maxDf + 1)).as("postings"))
      .filter(size(col("postings")).between(2, maxDf))
    val shared = buckets
      .select(explode(expr(
        """flatten(transform(postings, (x, i) ->
           transform(slice(postings, i + 2, size(postings)),
             y -> struct(x.doc_id AS id_a, y.doc_id AS id_b,
                         x.set_size AS size_a, y.set_size AS size_b))))"""))
        .as("p"))
      .groupBy(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"),
        col("p.size_a").as("size_a"), col("p.size_b").as("size_b"))
      .agg(count(lit(1)).as("inter"))
    // floor(x*1e4+0.5)/1e4 instead of round(): identical IEEE ops on
    // the identical binary double in every engine, so the DuckDB
    // oracle reproduces the value bit-for-bit
    shared.withColumn("jaccard",
        floor(col("inter").cast("double") /
          (col("size_a") + col("size_b") - col("inter")).cast("double")
          * lit(10000.0) + lit(0.5)) / lit(10000.0))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Per-document best-match summary (one row per doc). */
  def summary(docs: DataFrame, idCol: String, textCol: String,
              k: Int = 3, maxDf: Int = 50): DataFrame = {
    // cached: the sym union below evaluates the pair pipeline twice
    val p = pairs(docs, idCol, textCol, k, threshold = 0.0, maxDf = maxDf).cache()
    val sym = p.select(col("id_a").as("doc_id"), col("id_b").as("other_id"), col("jaccard"))
      .union(p.select(col("id_b").as("doc_id"), col("id_a").as("other_id"), col("jaccard")))
    val best = sym.groupBy("doc_id").agg(
      count(lit(1)).as("n_overlapping"),
      max(struct(col("jaccard"), col("other_id"))).as("best"))
      .select(col("doc_id"), col("n_overlapping"),
        col("best.other_id").as("best_match_id"), col("best.jaccard").as("best_jaccard"))
    docs.select(col(idCol).as("doc_id")).join(best, Seq("doc_id"), "left")
      .na.fill(Map("n_overlapping" -> 0L, "best_jaccard" -> -1.0))
  }
}
