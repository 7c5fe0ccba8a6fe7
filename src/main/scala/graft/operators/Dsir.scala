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
  * Shape at scale — one corpus pass, ONE bucket-keyed token exchange:
  * the exploded (bucket, doc) pairs repartition by bucket once; the
  * per-(bucket,doc) counts, the B-row source/target histogram, and
  * the corpus totals all consume that exchange (ReusedExchange — the
  * [[UnigramLm]] chaining discipline). The per-bucket log-ratio table
  * is B rows (B=1024 default) → broadcast; per-token log-ratios are
  * integerized (1e-6 units) before the per-doc sum so float summation
  * order can never bend a weight. The only other exchange is the
  * doc-keyed final aggregate, map-side-collapsed to one row per doc
  * per partition. Nothing in the plan grows with vocabulary, and
  * nothing is a global sort: selection is a pure per-row filter
  * (hash-u < sigmoid(weight)), so the operator is a filter-shaped
  * corpus pass at 100 TB, not a rank.
  */
object Dsir {

  private def pround(c: Column, dp: Int): Column = {
    val f = math.pow(10, dp)
    floor(c * lit(f) + lit(0.5)) / lit(f)
  }

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
    val pairs = docs
      .select(col(idCol), isTarget.cast("boolean").as("__is_t"),
        explode(TF.tokens(col(textCol))).as("__term"))
      .filter(length(col("__term")) > 0)
      .select(col(idCol), col("__is_t"),
        bucket(col("__term"), nBuckets, salt).as("__b"))
      // pre-empt the not-null constraints the downstream joins would
      // infer (__b from the model join, id from the left-outer
      // docs⋈perDoc): without them one branch gains a pushed Filter
      // the others lack, the subtrees stop being identical, and
      // exchange reuse dies — the corpus would tokenize once PER BRANCH
      .filter(col("__b").isNotNull && col(idCol).isNotNull)
      .repartition(col("__b"))
    // chain every relation from tfb so the one exchange is reused:
    // hashpartitioning(__b) satisfies the (__b, id) clustering (subset
    // key), so the groupBy below adds NO new exchange, and the B-row
    // histogram re-aggregates the same partitions in place. __is_t is
    // a grouping KEY (it is doc-functional, so groups are unchanged):
    // as a mere aggregate input, column pruning would rewrite the
    // projection BELOW the exchange for the branches that don't read
    // it, breaking the subtree identity ReusedExchange needs.
    val tfb = pairs.groupBy(col("__b"), col(idCol), col("__is_t"))
      .agg(count(lit(1)).as("__cnt"))
    val dist = tfb.groupBy(col("__b")).agg(
      sum(col("__cnt")).as("__src"),
      sum(when(col("__is_t"), col("__cnt")).otherwise(lit(0L))).as("__tgt"))
    val totals = dist.agg(sum(col("__src")).as("__src_tot"),
      sum(col("__tgt")).as("__tgt_tot"))
    // add-1 smoothing over the FULL bucket range: buckets never seen in
    // the target still get mass, and the denominator is nBuckets in
    // both engines regardless of how many buckets materialized
    val b = lit(nBuckets.toDouble)
    val ilr = dist.crossJoin(broadcast(totals))
      .select(col("__b"),
        floor(log(
          ((col("__tgt") + lit(1.0)) / (col("__tgt_tot") + b)) /
          ((col("__src") + lit(1.0)) / (col("__src_tot") + b)))
          * lit(1e6) + lit(0.5)).cast("long").as("__ilr"))
    val perDoc = tfb.join(broadcast(ilr), "__b")
      .groupBy(idCol)
      .agg(sum(col("__cnt")).as("n_tok"),
        sum(col("__cnt") * col("__ilr")).as("__s"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tok"), lit(0L)).as("n_tok"),
        when(col("n_tok").isNull, lit(0.0)).otherwise(
          pround(col("__s").cast("double") / (col("n_tok") * lit(1e6)), 4))
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
