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
  * Shape at scale — one corpus pass, ONE term-keyed shuffle, like
  * [[TfIdf]]: the exploded pairs repartition by term once; the
  * frequency aggregate, the corpus-total re-aggregate, and the
  * pairs⋈freq join all consume that same exchange (Spark plans the
  * repeats as ReusedExchange). Per-token log-probs are integerized
  * (1e-6 units) before the per-doc sum, so float summation order —
  * which is partition-dependent in Spark and engine-internal in any
  * oracle — can never bend the mean.
  */
object UnigramLm {

  private def pround(c: Column, dp: Int): Column = {
    val f = math.pow(10, dp)
    floor(c * lit(f) + lit(0.5)) / lit(f)
  }

  /** (id, n_tok, logprob_mean): mean ln p(token) per doc, 4 dp;
    * token-less docs carry (0, 0.0).
    */
  def scores(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val pairs = docs
      .select(col(idCol), explode(TF.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .repartition(col("term"))
    // every downstream relation chains from tf, so each branch prunes
    // the SAME (term, id) columns out of the one exchange — distinct
    // per-branch pruning would break the subtree identity ReusedExchange
    // needs, and the corpus would tokenize twice
    val tf = pairs.groupBy(col("term"), col(idCol)).agg(count(lit(1)).as("tf"))
    val freq = tf.groupBy("term").agg(sum("tf").as("freq"))
    val total = freq.agg(sum("freq").as("total"))
    val perDoc = tf.join(freq, "term")
      .crossJoin(broadcast(total))
      .select(col(idCol), col("tf"),
        (col("tf") * floor(log(col("freq").cast("double") / col("total"))
          * lit(1e6) + lit(0.5)).cast("long")).as("lps"))
      .groupBy(idCol)
      .agg(sum(col("tf")).as("n_tok"), sum("lps").as("s"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tok"), lit(0L)).as("n_tok"),
        when(col("n_tok").isNull, lit(0.0)).otherwise(
          pround(col("s").cast("double") / (col("n_tok") * lit(1000000.0)), 4))
          .as("logprob_mean"))
  }
}
