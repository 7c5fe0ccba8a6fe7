package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

/** Cross-source contamination matrix: for every pair of corpus
  * sources, how much k-shingle content they SHARE — the diagnostic
  * that tells you which crawls/dumps duplicate each other before you
  * decide mixing weights (two sources with high containment are one
  * source counted twice; cf. the overlap audits in Dodge et al. 2021
  * on C4 and the RefinedWeb/FineWeb dump-overlap analyses).
  *
  * Output, one row per unordered source pair (src_a < src_b):
  * shared distinct shingles, each side's distinct-shingle total, and
  * `containment` = shared / min(n_a, n_b) — the asymmetric-size-safe
  * overlap measure (Jaccard under-reads when one source dwarfs the
  * other).
  *
  * Scale design (100 TB corpus):
  *  - ONE shingle-keyed exchange carries everything: `collect_set`
  *    over sources partial-aggregates map-side, so each mapper emits
  *    at most one row per (shingle, ≤|sources| set) — reducer input
  *    is bounded by distinct-shingle count, not corpus token count;
  *  - the per-shingle source-pair grid is a narrow array HOF bounded
  *    by |sources|² (single digits squared), never a join — the
  *    [[Cooccur]] pattern with the roles flipped;
  *  - per-source totals branch off the SAME shingle aggregate
  *    (ReusedExchange) and are |sources| rows — broadcast by
  *    construction; the pair table is |sources|² rows.
  *  - at 100 TB the only heavy term is the shingle exchange, which
  *    exact cross-source dedup pays anyway; for a cheaper advisory
  *    pass, feed a [[Sampling]] draw — containment is ratio-based
  *    and survives uniform sampling approximately unbiased.
  */
object SourceOverlap {

  /** Shared-shingle matrix over `docs`. `k` is the shingle width. */
  def matrix(docs: DataFrame, srcCol: String, textCol: Column, k: Int): DataFrame = {
    // one shingle-keyed exchange: distinct sources per shingle
    val bySh = docs
      .select(col(srcCol).as("src"), explode(TF.shingles(textCol, k)).as("sh"))
      .groupBy("sh")
      .agg(sort_array(collect_set(col("src"))).as("srcs"))

    // per-source distinct-shingle totals: |sources| rows off the same
    // aggregate (the exchange is reused; the re-agg is set-sized)
    val totals = bySh.select(explode(col("srcs")).as("src"))
      .groupBy("src").agg(count(lit(1)).as("n"))

    // narrow per-shingle pair grid, bounded by |sources|²
    val pairs = bySh.filter(size(col("srcs")) >= 2)
      .select(explode(flatten(
        transform(col("srcs"), (a, i) =>
          transform(slice(col("srcs"), i + lit(2), size(col("srcs")) - i - lit(1)),
            b => struct(a.as("src_a"), b.as("src_b")))))).as("p"))
      .groupBy(col("p.src_a").as("src_a"), col("p.src_b").as("src_b"))
      .agg(count(lit(1)).as("shared_shingles"))

    pairs
      .join(broadcast(totals.select(col("src").as("src_a"), col("n").as("n_a"))), "src_a")
      .join(broadcast(totals.select(col("src").as("src_b"), col("n").as("n_b"))), "src_b")
      .select(col("src_a"), col("src_b"), col("shared_shingles"),
        col("n_a"), col("n_b"),
        (floor(col("shared_shingles").cast("double")
          / least(col("n_a"), col("n_b")) * 1e4 + lit(0.5)) / 1e4).as("containment"))
      .orderBy("src_a", "src_b")
  }

  /** Sketch-based overlap matrix — the SUB-EXCHANGE 100 TB form: each
    * source folds its shingle-hash set into ONE mergeable HLL sketch
    * (DataSketches `hll_sketch_agg`, partial-aggregated map-side), so
    * the wire carries |sources| KB-sized blobs instead of the
    * distinct-shingle exchange [[matrix]] pays. Pairwise shared
    * counts come from inclusion-exclusion over binary sketch unions
    * (`hll_union`), all on a |sources|²-row local frame. Estimates
    * inherit HLL error (rse ≈ 1.04/√2^lgK per sketch; the
    * inclusion-exclusion difference compounds it across three
    * estimates — small overlaps between large sources read noisy, the
    * standard sketch-intersection caveat). Output:
    * (src_a, src_b, est_a, est_b, est_shared) for every pair.
    */
  def sketchMatrix(docs: DataFrame, srcCol: String, textCol: Column,
      k: Int, lgK: Int = 14): DataFrame = {
    val perSrc = docs
      .select(col(srcCol).as("src"),
        explode(call_function("shingle_hash64", TF.tokens(textCol), lit(k))).as("h"))
      .groupBy("src")
      .agg(hll_sketch_agg(col("h"), lit(lgK)).as("sk"))
      .select(col("src"), col("sk"),
        hll_sketch_estimate(col("sk")).cast("long").as("est_n"))
    val a = perSrc.select(col("src").as("src_a"), col("sk").as("sk_a"),
      col("est_n").as("est_a"))
    val b = perSrc.select(col("src").as("src_b"), col("sk").as("sk_b"),
      col("est_n").as("est_b"))
    a.join(broadcast(b), col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"), col("est_a"), col("est_b"),
        (col("est_a") + col("est_b") -
          hll_sketch_estimate(hll_union(col("sk_a"), col("sk_b")))
            .cast("long")).as("est_shared"))
  }
}
