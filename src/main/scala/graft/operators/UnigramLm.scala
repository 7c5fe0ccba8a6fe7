package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Unigram language-model scoring: each document's mean token
  * log-probability under the corpus's own unigram distribution — the
  * classic cheap LM-quality proxy (CCNet-style filtering ranks docs
  * by LM score; a unigram model is its shuffle-friendly floor).
  * Gibberish and boilerplate-heavy docs score low; typical prose
  * scores near the corpus mode.
  *
  * Shape at scale — model pass, then a broadcast-model scoring pass:
  * the frequency model aggregates straight off the explode, so
  * map-side partial aggregation collapses each partition to its
  * distinct terms BEFORE the exchange — the shuffle carries the
  * vocabulary, never the token stream. The scoring pass re-tokenizes
  * and probes the model as a broadcast hash join; its per-doc partial
  * aggregate collapses to one row per document per partition before
  * the only doc-keyed exchange (explode keeps a document's tokens
  * inside one scan partition), so that exchange carries |docs| skinny
  * rows. This replaces the r5 one-tokenize/ReusedExchange form, which
  * repartitioned every (term, doc) token pair — a corpus-sized
  * shuffle of raw token strings; re-tokenizing costs one extra scan
  * of CPU, strictly cheaper at scale (the [[Dsir]] rework's A/B).
  * The broadcast is the MODEL (vocab-bounded, heavy-tail-capped in
  * practice); a corpus whose vocabulary outgrows broadcast should
  * score through [[Dsir]]-style hashed buckets instead — that
  * trade-off is the whole reason hashed n-gram models exist.
  * Per-token log-probs are integerized (1e-6 units) before the
  * per-doc sum, so float summation order — partition-dependent in
  * Spark and engine-internal in any oracle — can never bend the mean
  * (and is what makes the per-token resummation here bit-identical
  * to the old per-(term,doc)-count formulation).
  */
object UnigramLm {

  private def pround = graft.functions.Rounding.pround _

  /** (id, n_tok, logprob_mean): mean ln p(token) per doc, 4 dp;
    * token-less docs carry (0, 0.0).
    */
  def scores(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    def toks = docs
      .select(col(idCol), explode(TF.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
    // model pass: groupBy straight off the explode — partial
    // aggregation collapses to distinct-terms-per-partition before
    // the exchange (never the token stream)
    val freq = toks.groupBy("term").agg(count(lit(1)).as("freq"))
    val total = freq.agg(sum("freq").as("total"))
    val logp = freq.crossJoin(broadcast(total))
      .select(col("term"),
        floor(log(col("freq").cast("double") / col("total"))
          * lit(1e6) + lit(0.5)).cast("long").as("ilp"))
    // scoring pass: probe the broadcast model per token; the partial
    // aggregate collapses to one row per doc in place, so the only
    // doc-keyed exchange carries |docs| rows
    val perDoc = toks.join(broadcast(logp), "term")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tok"), sum("ilp").as("s"))
      .select(col(idCol), col("n_tok"),
        pround(col("s").cast("double") / (col("n_tok") * lit(1000000.0)), 4)
          .as("logprob_mean"))
    // token-less docs re-enter through a NARROW union branch (a scan
    // filter), not a corpus-keyed left join: every doc with ≥1 token
    // is in perDoc by construction, so the union is exact and the
    // plan never joins on the doc key at any scale
    val empties = docs
      .filter(size(filter(TF.tokens(col(textCol)), t => length(t) > 0)) === 0)
      .select(col(idCol), lit(0L).as("n_tok"), lit(0.0).as("logprob_mean"))
    perDoc.unionByName(empties)
  }
}
