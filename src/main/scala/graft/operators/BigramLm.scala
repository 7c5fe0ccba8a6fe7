package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Bigram language-model scoring with add-1 smoothing: each document's
  * mean ln P(w_i | w_{i-1}) under the corpus's own bigram counts — one
  * step up the CCNet ladder from [[UnigramLm]] (real LM-perplexity
  * filters are n-gram models; the bigram captures local word order,
  * which the unigram cannot: shuffled gibberish with a normal word
  * histogram scores low here).
  *
  * Shape at scale — one corpus pass, then everything is keyed by
  * BIGRAM TYPE (bounded by vocab², not corpus size):
  *  - bigrams derive from the token array with a narrow HOF zip
  *    (no position self-join);
  *  - per-doc bigram tf, corpus bigram counts, and context counts
  *    aggregate from the same exploded frame;
  *  - the smoothing vocabulary size V is a 1-row broadcast;
  *  - per-token log-probs are integerized (1e-6 units) before the
  *    per-doc sum, so float summation order can never bend the mean.
  */
object BigramLm {

  private def pround = graft.functions.Rounding.pround _

  /** (id, n_bigrams, logprob_mean): mean ln P(w2|w1), 4 dp; docs with
    * fewer than two tokens carry (0, 0.0).
    */
  def scores(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TF.tokens(col(textCol))
    val bigramArr = when(size(toks) < 2,
        array().cast("array<struct<w1:string,w2:string>>"))
      .otherwise(transform(sequence(lit(1), size(toks) - 1),
        i => struct(element_at(toks, i).as("w1"),
          element_at(toks, i + 1).as("w2"))))
    val bg = docs
      .select(col(idCol), explode(bigramArr).as("b"))
      .select(col(idCol), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .repartition(col("w1"), col("w2"))
    val tfb = bg.groupBy(col("w1"), col("w2"), col(idCol)).agg(count(lit(1)).as("tf"))
    val fb = tfb.groupBy("w1", "w2").agg(sum("tf").as("c_bg"))
    val ctx = fb.groupBy("w1").agg(sum("c_bg").as("c_ctx"))
    val vocab = docs
      .select(explode(toks).as("term")).filter(length(col("term")) > 0)
      .agg(count_distinct(col("term")).as("v"))
    val perDoc = tfb.join(fb, Seq("w1", "w2"))
      .join(ctx, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col(idCol), col("tf"),
        (col("tf") * floor(log((col("c_bg") + lit(1.0)) /
            (col("c_ctx") + col("v")))
          * lit(1e6) + lit(0.5)).cast("long")).as("lps"))
      .groupBy(idCol)
      .agg(sum(col("tf")).as("n_bigrams"), sum("lps").as("s"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        when(col("n_bigrams").isNull, lit(0.0)).otherwise(
          pround(col("s").cast("double") / (col("n_bigrams") * lit(1000000.0)), 4))
          .as("logprob_mean"))
  }
}
