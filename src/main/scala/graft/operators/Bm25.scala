package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** BM25 ranked text retrieval over a document corpus — the search
  * primitive an LLM-data pipeline uses for targeted corpus curation
  * (find all docs about X, score prompts against a topic, build
  * retrieval eval sets).
  *
  * Scale shape: tokens are EXPLODED ONLY FOR QUERY TERMS — the
  * per-doc projection computes term frequencies of the (tiny,
  * broadcast-literal) query vocabulary inside the scan, so the only
  * shuffled rows are (doc, query_term, tf) postings that actually
  * match, never the full inverted index. Document length norms come
  * from one scalar subquery (a broadcast single-row agg). Top-k plans
  * as TakeOrdered. At 100 TB: one corpus pass, postings ∝ matching
  * docs × |query|, no full-vocabulary shuffle.
  */
object Bm25 {

  /** Per-term BM25 score contribution; standard Okapi with the
    * Lucene-style non-negative idf: ln(1 + (N - df + 0.5)/(df + 0.5)).
    */
  private def termScore(tf: Column, df: Column, n: Column, dl: Column,
                        avgdl: Column, k1: Double, b: Double): Column = {
    val idf = log(lit(1.0) + (n - df + lit(0.5)) / (df + lit(0.5)))
    idf * tf * lit(k1 + 1.0) /
      (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / avgdl))
  }

  /** Top-k documents for `queryTerms` by BM25(k1, b). Output:
    * (doc_id, score, n_hits) with `score` floor-rounded to 4 dp for
    * cross-engine comparison and (score desc, id asc) tie-broken.
    */
  def topK(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k: Int = 10,
           k1: Double = 1.5, b: Double = 0.75): DataFrame = {
    // default k1/b are exact binary doubles, so k1+1 and 1-b are too —
    // the DuckDB oracle reproduces every constant bit-for-bit
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val terms = queryTerms.map(_.toLowerCase).distinct

    // one narrow pass: doc length + tf of each query term, computed
    // in the scan projection (no explode of non-matching tokens)
    val toks = TextFunctions.tokens(col(textCol))
    val withTf = docs.select(
      col(idCol),
      size(toks).cast("double").as("dl"),
      array(terms.map(t =>
        size(filter(toks, x => x === lit(t))).cast("double")): _*).as("tfs"))

    // corpus stats: N, avgdl, and per-term document frequencies in a
    // single tiny agg row (broadcast into the scoring join)
    val stats = withTf.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"),
      array(terms.indices.map(i =>
        sum(when(col("tfs")(i) > 0, 1.0).otherwise(0.0)).as(s"df_$i")): _*).as("dfs"))

    val scored = withTf.join(broadcast(stats))
      .select(Seq(col(idCol), col("dl")) ++
        terms.indices.map(i =>
          when(col("tfs")(i) > 0,
            termScore(col("tfs")(i), col("dfs")(i), col("n_docs"),
              col("dl"), col("avgdl"), k1, b)).otherwise(lit(0.0)).as(s"s_$i")): _*)
      .select(col(idCol),
        terms.indices.map(i => col(s"s_$i")).reduce(_ + _).as("raw_score"),
        terms.indices.map(i => when(col(s"s_$i") > 0, 1L).otherwise(0L))
          .reduce(_ + _).as("n_hits"))
      .filter(col("n_hits") > 0)

    scored
      .select(col(idCol),
        (floor(col("raw_score") * lit(10000.0) + lit(0.5)) / lit(10000.0)).as("score"),
        col("n_hits"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }
}
