package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Vocabulary-distribution DRIFT between corpus slices — the text
  * analog of the numeric ingest-drift scorecard ([[Drift]] covers
  * PSI/KS over values; this covers what a crawl pipeline actually
  * watches between dumps: did the token DISTRIBUTION move?).
  * Pairwise Jensen-Shannon divergence between per-family unigram
  * distributions: JS(P,Q) = ½KL(P‖M) + ½KL(Q‖M), M = ½(P+Q) —
  * symmetric, bounded by ln 2, and defined even where supports
  * differ (the reason it beats raw KL for disjoint-ish crawl dumps).
  *
  * Cross-engine exactness: probabilities are exact rationals
  * (count/total — both engines produce the identical correctly-
  * rounded double), and each TOKEN's JS contribution integerizes to
  * nano units (floor(x·1e9 + 0.5)) BEFORE the per-pair sum, so the
  * aggregate is an exact Long sum — order-free, immune to float
  * summation order (the q_unigram_logprob discipline). Output
  * `js_nano` is the integer the oracle reproduces bit-for-bit.
  *
  * Scale shape: ONE token exchange builds (family, token, count);
  * everything after runs on VOCAB-sized frames — the per-token
  * family map is ≤|families| entries per row, the pair grid is a
  * broadcast |families|²-row frame (a non-equi self-join of the
  * |families|-row totals — no driver collect, r13) crossed with the
  * token map, and the final exchange carries |pairs| rows. Document
  * count never appears after the first aggregation — and the
  * expression stays FIXED-SIZE at any family count (see the
  * pairs-as-data note in [[jsMatrix]]). The whole matrix is one
  * Spark job: every consumer folds off the same (fam, t) exchange
  * (runtime ReusedExchange), where the r12 form paid an eager
  * checkpoint job plus a totals-collect round-trip first.
  */
object VocabDrift {

  /** Pairwise JS matrix over `famCol` slices: (fam_a, fam_b,
    * n_tok_a, n_tok_b, js_nano) for fam_a < fam_b.
    */
  def jsMatrix(docs: DataFrame, famCol: String, textCol: String): DataFrame = {
    val cnt = docs
      .select(col(famCol).as("fam"), explode(TF.tokens(col(textCol))).as("t"))
      .filter(length(col("t")) > 0)
      .groupBy("fam", "t").agg(count(lit(1)).as("c"))
    // family totals: bounded by |families|. Until r12 these were
    // COLLECTED (plus an eager localCheckpoint so the corpus pass ran
    // once) and the pair grid planted as a local relation — two extra
    // Spark jobs at plan construction. Both consumers now fold off
    // the SAME (fam, t) aggregation exchange inside one plan (the
    // runtime collapses the clones to ReusedExchange — one corpus
    // pass, zero driver round-trips); the divisions still see the
    // identical exact integers, just as join columns instead of
    // literals.
    val totals = cnt.groupBy("fam").agg(sum(col("c")).as("tc"))
    // vocab-sized frame: per token, the per-family count map
    val tokMap = cnt.groupBy("t")
      .agg(map_from_entries(collect_list(struct(col("fam"), col("c"))))
        .as("byFam"))
    // per (token, pair) contribution, integerized to nano units. The
    // pair grid is a broadcast |families|²-row frame (a non-equi
    // self-join of the tiny totals) crossed with the token map —
    // pairs as DATA, not as expression: the first form inlined one
    // struct PER PAIR into a single projection (210 pairs at sf10's
    // 21 families → a ~4000-node Catalyst tree whose optimize+janino
    // cost was ~6 s of the gate's 7 s, ~5x the actual work; measured
    // r12). One fixed-size expression over vocab × pairs rows costs
    // the same exchanges and plans in milliseconds at any family
    // count.
    val pairGrid = totals.select(col("fam").as("fam_a"), col("tc").as("n_tok_a"))
      .join(totals.select(col("fam").as("fam_b"), col("tc").as("n_tok_b")),
        col("fam_a") < col("fam_b"))
      .select("fam_a", "fam_b", "n_tok_a", "n_tok_b")
    val p1 = coalesce(element_at(col("byFam"), col("fam_a")), lit(0L))
      .cast("double") / col("n_tok_a").cast("double")
    val p2 = coalesce(element_at(col("byFam"), col("fam_b")), lit(0L))
      .cast("double") / col("n_tok_b").cast("double")
    val m = (p1 + p2) / lit(2.0)
    val term = (when(p1 > 0, p1 * log(p1 / m)).otherwise(lit(0.0)) +
      when(p2 > 0, p2 * log(p2 / m)).otherwise(lit(0.0))) * lit(0.5)
    tokMap.crossJoin(broadcast(pairGrid))
      .select(col("fam_a"), col("fam_b"), col("n_tok_a"), col("n_tok_b"),
        floor(term * lit(1e9) + lit(0.5)).cast("long").as("nano"))
      .groupBy("fam_a", "fam_b", "n_tok_a", "n_tok_b")
      .agg(sum(col("nano")).as("js_nano"))
  }
}
