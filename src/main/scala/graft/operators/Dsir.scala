package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** DSIR-style data selection: score every document by how much more
  * likely its tokens are under a TARGET distribution than under the
  * SOURCE (full-corpus) distribution, then resample the corpus toward
  * the target (Xie et al. 2023, "Data Selection for Language Models
  * via Importance Resampling"). The reference pipeline's quality
  * filters are absolute (length/alpha/stopword gates); this is the
  * relative form — "keep what looks like the data I want more of" —
  * and the standard way to tilt a 100 TB crawl toward a curated seed
  * corpus without training a classifier.
  *
  * Features are hashed unigram buckets (the paper's hashed n-gram
  * model): `bucket(term) = md5-leading-32-bits(term + salt) mod B`.
  * md5 makes the bucketing engine-portable — the DuckDB oracle
  * reproduces every weight exactly — and `B` caps the model size
  * regardless of vocabulary, which is the property that lets the
  * bucket statistics broadcast at any corpus scale.
  *
  * Shape at scale — model pass, then a scan-pure scoring pass:
  * pass 1 aggregates the B-row (source, target) bucket histogram with
  * map-side partial aggregation, so its exchange carries ≤ B rows per
  * map partition — never the token stream. The histogram is collected
  * (≤ B rows — bounded by the MODEL size, the Ivf cell-list
  * precedent, not by the corpus), the per-bucket log-ratio table is
  * computed locally with the identical double arithmetic, and pass 2
  * scores every document as a pure narrow projection: per-token
  * log-ratios come from a B-element array LITERAL indexed by the
  * hashed bucket inside the token-array fold — no explode, no
  * doc-keyed exchange, no join. Per-token log-ratios are integerized
  * (1e-6 units) before the per-doc sum so summation order can never
  * bend a weight (which is also what lets the fold replace the old
  * aggregate bit-identically).
  *
  * This replaces the r9 one-tokenize/ReusedExchange shape, which
  * shuffled every (bucket, doc) token pair and then every per-doc
  * partial — two corpus-sized exchanges. Re-tokenizing in pass 2
  * costs one extra scan of CPU; at 100 TB a compressed parquet
  * re-scan is strictly cheaper than shuffling the token stream twice
  * (builder-side A/B at sf10: 10.6 s → see BENCH_r09). Nothing in
  * the plan grows with vocabulary, and nothing is a global sort:
  * selection is a pure per-row filter (hash-u < sigmoid(weight)), so
  * the operator is a filter-shaped corpus pass at 100 TB, not a rank.
  */
object Dsir {

  private def pround = graft.functions.Rounding.pround _

  /** Portable hashed-unigram bucket in [0, nBuckets). */
  def bucket(term: Column, nBuckets: Int, salt: Int): Column =
    pmod(conv(substring(md5(concat(term, lit("#" + salt))), 1, 8), 16, 10)
      .cast("long"), lit(nBuckets.toLong))

  /** (idCol, n_tok, dsir_logratio): per-doc mean hashed-unigram
    * log importance ratio ln(p_target/p_source), add-1 smoothed over
    * `nBuckets` buckets, 4 dp; token-less docs carry (0, 0.0).
    *
    * `isTarget` is a boolean column over `docs` marking the seed/
    * target subset (e.g. `col("lang") === "en"`); the source
    * distribution is the whole corpus, target ⊆ source as in the
    * paper's raw-vs-target formulation.
    */
  def weights(docs: DataFrame, idCol: String, textCol: String,
              isTarget: Column, nBuckets: Int = 1024,
              salt: Int = 13): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    // ---- pass 1: the B-row model. groupBy straight off the explode:
    // the partial aggregate collapses each map partition to ≤ 2B rows
    // BEFORE the exchange, so the shuffle never carries the token
    // stream (the r9 repartition(__b) form did — 27.5M rows at sf10).
    val hist = docs
      .select(isTarget.cast("boolean").as("__is_t"),
        explode(TF.tokens(col(textCol))).as("__term"))
      .filter(length(col("__term")) > 0)
      .select(col("__is_t"), bucket(col("__term"), nBuckets, salt).as("__b"))
      .groupBy(col("__b"))
      .agg(count(lit(1)).as("__src"),
        sum(when(col("__is_t"), lit(1L)).otherwise(lit(0L))).as("__tgt"))
      .collect() // ≤ nBuckets rows — bounded by the model, not the corpus
    // local log-ratio table, same double arithmetic the r9 in-plan
    // expression ran (Spark's log IS Math.log): add-1 smoothing over
    // the FULL bucket range, so buckets never seen anywhere — absent
    // from `hist` entirely — still get the smoothed default, and the
    // denominator is nBuckets in both engines regardless of how many
    // buckets materialized.
    var srcTot = 0L; var tgtTot = 0L
    hist.foreach { r => srcTot += r.getLong(1); tgtTot += r.getLong(2) }
    val b = nBuckets.toDouble
    def ilrOf(src: Long, tgt: Long): Long =
      math.floor(math.log(
        ((tgt + 1.0) / (tgtTot + b)) / ((src + 1.0) / (srcTot + b)))
        * 1e6 + 0.5).toLong
    val lut = Array.fill(nBuckets)(ilrOf(0L, 0L))
    hist.foreach { r => lut(r.getLong(0).toInt) = ilrOf(r.getLong(1), r.getLong(2)) }
    // ---- pass 2: scan-pure scoring. The B-element table rides into
    // the plan as an array literal; each doc folds its token array
    // through it — integer adds, so order is irrelevant and the fold
    // is bit-identical to the old per-bucket-count formulation.
    val lutCol = lit(lut)
    val scored = TF.bindOnce(
      filter(TF.tokens(col(textCol)), t => length(t) > 0), ts =>
        struct(
          size(ts).cast("long").as("n_tok"),
          aggregate(ts, lit(0L), (acc, t) =>
            acc + element_at(lutCol,
              (bucket(t, nBuckets, salt) + lit(1L)).cast("int"))).as("__s")))
    docs.select(col(idCol), scored.as("__r"))
      .select(col(idCol),
        col("__r.n_tok").as("n_tok"),
        when(col("__r.n_tok") === 0, lit(0.0)).otherwise(
          pround(col("__r.__s").cast("double") /
            (col("__r.n_tok") * lit(1e6)), 4))
          .as("dsir_logratio"))
  }

  /** Importance-resample the corpus: keep a doc iff its portable
    * uniform draw u(id, sampleSalt) falls below
    * sigmoid(scale * dsir_logratio) — docs that look more target-like
    * than source-typical (ratio > 0) keep with p > 1/2, others decay
    * smoothly. A pure per-row filter over the weights frame (the
    * scalable stand-in for the paper's global Gumbel top-k, which
    * would be a corpus-wide sort); `scale` sharpens the tilt.
    *
    * The sigmoid is rounded to 4 dp BEFORE the compare and its input
    * is the already-4dp weight, so both engines compare identical
    * doubles (the established ln/exp integerization discipline).
    * Output: (idCol, dsir_logratio, accept_p).
    */
  def sample(docs: DataFrame, idCol: String, textCol: String,
             isTarget: Column, scale: Double = 3.0, nBuckets: Int = 1024,
             salt: Int = 13, sampleSalt: Int = 29): DataFrame = {
    val w = weights(docs, idCol, textCol, isTarget, nBuckets, salt)
    val p = pround(lit(1.0) / (lit(1.0) + exp(col("dsir_logratio") * lit(-scale))), 4)
    w.select(col(idCol), col("dsir_logratio"), p.as("accept_p"))
      .filter(Sampling.portableUniform(idCol, sampleSalt) < col("accept_p"))
  }
}
