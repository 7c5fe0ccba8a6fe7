package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Corpus vocabulary-health statistics — the Zipf frequency spectrum
  * and its scalar summaries (type-token ratio, hapax fraction), the
  * standard corpus-linguistics diagnostics for synthetic-data
  * collapse and crawl-quality drift (a healthy corpus is Zipfian; a
  * template farm has a truncated spectrum and a collapsed TTR).
  *
  * Scale shape: ONE tokenize pass → term-keyed partial-agged counts;
  * the spectrum re-keys those VOCAB-sized rows by frequency (distinct
  * frequencies are O(√tokens) — Σ of k distinct counts ≥ k(k+1)/2 —
  * so the output stays small even at 100 TB), and the summary is a
  * single aggregate over the same vocab-sized frame. Documents are
  * never shuffled; nothing doc-keyed leaves the scan.
  */
object VocabStats {

  private def pround = graft.functions.Rounding.pround _

  private def termCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TF.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term").agg(count(lit(1)).as("freq"))

  /** Zipf spectrum: (freq, n_types, vocab_share 6dp), one row per
    * distinct corpus frequency.
    */
  def spectrum(docs: DataFrame, textCol: String): DataFrame = {
    val tc = termCounts(docs, textCol)
    val spec = tc.groupBy("freq").agg(count(lit(1)).as("n_types"))
    val vocab = tc.agg(count(lit(1)).as("n_vocab"))
    spec.crossJoin(broadcast(vocab))
      .select(col("freq"), col("n_types"),
        pround(col("n_types").cast("double") / col("n_vocab"), 6)
          .as("vocab_share"))
  }

  /** One-row summary: token count, type count, hapax count/fraction,
    * type-token ratio (6dp).
    */
  def summary(docs: DataFrame, textCol: String): DataFrame =
    termCounts(docs, textCol).agg(
        sum("freq").as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("freq") === 1, 1L).otherwise(0L)).as("hapax_types"))
      .select(col("n_tokens"), col("n_types"), col("hapax_types"),
        pround(col("hapax_types").cast("double") / col("n_types"), 6)
          .as("hapax_frac"),
        pround(col("n_types").cast("double") / col("n_tokens"), 6)
          .as("type_token_ratio"))
}
