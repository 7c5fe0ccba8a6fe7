package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Stupid Backoff n-gram LM scoring (Brants et al. 2007, "Large
  * Language Models in Machine Translation" §4 — the Google MT
  * trillion-token recipe): score each document by the mean ln S of its
  * trigrams under a model trained on a REFERENCE corpus, where
  *
  *   S(w3 | w1 w2) = c(w1w2w3) / c(w1w2)          trigram seen
  *                 = 0.4 · c(w2w3) / c(w2)        else, bigram seen
  *                 = 0.4² · (c(w3)+1) / (N+V)     else (add-1 unigram
  *                                                 floor, finite for
  *                                                 unseen words)
  *
  * Stupid Backoff deliberately skips normalization (scores, not
  * probabilities) — that is exactly what makes it the distributed-LM
  * form: every count table is a plain partial-agged groupBy, no
  * discounting pass, no held-out sweep. Unlike [[UnigramLm]] /
  * [[BigramLm]] (self-scored), the model here trains on a separate
  * reference slice, so the backoff chain genuinely fires on
  * out-of-model n-grams — the corpus-filtering setup (score the crawl
  * under a trusted-domain model, cf. CCNet's wiki-LM).
  *
  * Shape at scale:
  *  - trigram grids are narrow HOFs over each doc's token array — no
  *    position self-join, one tokenize per row per side;
  *  - the doc-side (doc, trigram) tf table joins ONE consolidated
  *    per-trigram-TYPE score table: all model joins (tri, bigram
  *    context, bigram, unigram) run over the DISTINCT doc trigram
  *    types — bounded by type count, never by corpus occurrences;
  *  - model totals (N, V) are a 1-row broadcast;
  *  - per-trigram log-scores are integerized (1e-6 units) before the
  *    per-doc sum, so float summation order can never bend the mean.
  */
object BackoffLm {

  private def pround(c: Column, dp: Int): Column = {
    val f = math.pow(10, dp)
    floor(c * lit(f) + lit(0.5)) / lit(f)
  }

  /** Trigram structs (w1,w2,w3) of a text column; <3 tokens → []. */
  private def trigramArr(textCol: Column): Column =
    TF.bindOnce(TF.tokens(textCol), toks =>
      when(size(toks) < 3,
          array().cast("array<struct<w1:string,w2:string,w3:string>>"))
        .otherwise(transform(sequence(lit(1), size(toks) - 2),
          i => struct(element_at(toks, i).as("w1"),
            element_at(toks, i + 1).as("w2"),
            element_at(toks, i + 2).as("w3")))))

  private def bigramArr(textCol: Column): Column =
    TF.bindOnce(TF.tokens(textCol), toks =>
      when(size(toks) < 2,
          array().cast("array<struct<w1:string,w2:string>>"))
        .otherwise(transform(sequence(lit(1), size(toks) - 1),
          i => struct(element_at(toks, i).as("w1"),
            element_at(toks, i + 1).as("w2")))))

  /** Per-document Stupid Backoff score under `model`'s counts.
    *
    * Output: (id, n_trigrams, n_hit3, n_hit2, n_hit1, backoff_mean)
    * — the hit tallies say which backoff level served each trigram
    * occurrence (they sum to n_trigrams), making the chain's firing
    * observable; backoff_mean is the 4-dp mean ln S. Docs with fewer
    * than three tokens carry (0, 0, 0, 0, 0.0).
    */
  def scores(docs: DataFrame, model: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // ---- model count tables (each one partial-agged groupBy) -------
    val mToks = model.select(explode(TF.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
    val uni = mToks.groupBy("w").agg(count(lit(1)).as("c1"))
    // N and V fold from the vocab-sized unigram table, NOT a fourth
    // corpus scan (each n-gram order already pays one, the Brants
    // MapReduce shape — but totals need not)
    val totals = uni.agg(sum("c1").as("n_tok"), count(lit(1)).as("v"))
    val big = model.select(explode(bigramArr(col(textCol))).as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("c2"))
    val tri = model.select(explode(trigramArr(col(textCol))).as("t"))
      .groupBy(col("t.w1").as("w1"), col("t.w2").as("w2"),
        col("t.w3").as("w3"))
      .agg(count(lit(1)).as("c3"))

    // ---- doc side: (doc, trigram) tf + distinct trigram types ------
    val docTri = docs
      .select(col(idCol), explode(trigramArr(col(textCol))).as("t"))
      .select(col(idCol), col("t.w1").as("w1"), col("t.w2").as("w2"),
        col("t.w3").as("w3"))
    val tfd = docTri.groupBy("w1", "w2", "w3", idCol)
      .agg(count(lit(1)).as("tf"))
    val types = tfd.select("w1", "w2", "w3").distinct()

    // ---- one score per trigram TYPE (all model joins happen here) --
    // a seen trigram implies its prefix bigram was seen, so the c3
    // branch never divides by null; add-1 keeps the unigram floor
    // finite for words the model has never seen at all
    val scored = types
      .join(tri, Seq("w1", "w2", "w3"), "left")
      .join(big.select(col("w1"), col("w2"), col("c2").as("c12")),
        Seq("w1", "w2"), "left")
      .join(big.select(col("w1").as("w2"), col("w2").as("w3"),
        col("c2").as("c23")), Seq("w2", "w3"), "left")
      .join(uni.select(col("w").as("w2"), col("c1").as("c_w2")),
        Seq("w2"), "left")
      .join(uni.select(col("w").as("w3"), col("c1").as("c_w3")),
        Seq("w3"), "left")
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("w3"),
        when(col("c3").isNotNull, lit(3))
          .when(col("c23").isNotNull, lit(2))
          .otherwise(lit(1)).as("level"),
        floor(log(
          when(col("c3").isNotNull,
            col("c3").cast("double") / col("c12"))
          .when(col("c23").isNotNull,
            lit(0.4) * col("c23") / col("c_w2"))
          .otherwise(lit(0.16) * (coalesce(col("c_w3"), lit(0L)) + lit(1L))
            / (col("n_tok") + col("v"))))
          * lit(1e6) + lit(0.5)).cast("long").as("lns"))

    val perDoc = tfd.join(scored, Seq("w1", "w2", "w3"))
      .groupBy(idCol)
      .agg(sum("tf").as("n_trigrams"),
        sum(when(col("level") === 3, col("tf")).otherwise(lit(0L))).as("n_hit3"),
        sum(when(col("level") === 2, col("tf")).otherwise(lit(0L))).as("n_hit2"),
        sum(when(col("level") === 1, col("tf")).otherwise(lit(0L))).as("n_hit1"),
        sum(col("tf") * col("lns")).as("s"))

    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("n_hit3"), lit(0L)).as("n_hit3"),
        coalesce(col("n_hit2"), lit(0L)).as("n_hit2"),
        coalesce(col("n_hit1"), lit(0L)).as("n_hit1"),
        when(col("n_trigrams").isNull, lit(0.0)).otherwise(
          pround(col("s").cast("double") / (col("n_trigrams") * lit(1000000.0)), 4))
          .as("backoff_mean"))
  }
}
