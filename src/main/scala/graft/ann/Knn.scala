package graft.ann

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - `bruteForceTopK`: exact — broadcast the (small) query set
  *    against the full corpus, codegen'd cosine, per-query top-k via
  *    window. The corpus side never shuffles; cost is one scan ×
  *    |queries|. Right answer when |queries| is small; the baseline
  *    for recall measurement.
  *  - `lshTopK`: approximate — sign-random-projection buckets on both
  *    sides; only same-bucket pairs are scored. Equality-join keyed
  *    by a compact long bucket id; at 100 TB the corpus is
  *    pre-bucketed once (write-time) and each query probes one
  *    bucket. Multi-probe = OR over `probes` plane subsets.
  */
object Knn {

  /** Exact top-k: one row per (query_id, rank). Cosine is rounded to
    * 4 dp and ties break on corpus id so ranking is deterministic and
    * engine-portable.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("nbr_id"), col("embedding").as("c_emb"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("nbr_id"))
      .withColumn("sim", VectorFunctions.cosineRounded(col("q_emb"), col("c_emb"), 4))
      .select("query_id", "nbr_id", "sim")
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("nbr_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("nbr_id"), col("sim"))
  }

  /** Matryoshka truncation eval (Kusupati et al. 2022,
    * arXiv:2205.13147): recall of PREFIX-truncated-dimension search
    * against full-dimension top-k, one row per candidate dim — the
    * table that decides how many dims an MRL-trained embedding can
    * shed for index size/speed before recall pays. Prefix slicing is
    * the MRL contract (coarse-to-fine information ordering); on
    * non-MRL embeddings the same table quantifies the damage.
    * Deterministic: 4-dp-rounded cosine with id tie-break at every
    * dim, so the top-k SETS are engine-portable and the recalls are
    * exact values, not bounds. Each dim's search is one broadcast
    * scan pass (the bruteForceTopK shape); the recall join touches
    * only k-row-per-query frames.
    */
  def truncatedRecall(corpus: DataFrame, queries: DataFrame, k: Int,
                      dims: Seq[Int]): DataFrame = {
    def trunc(df: DataFrame, dm: Int) =
      df.select(col("vec_id"), slice(col("embedding"), 1, dm).as("embedding"))
    val full = bruteForceTopK(corpus, queries, k).select("query_id", "nbr_id")
    dims.map { dm =>
      val t = bruteForceTopK(trunc(corpus, dm), trunc(queries, dm), k)
        .select("query_id", "nbr_id")
      full.join(t, Seq("query_id", "nbr_id"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
        .crossJoin(full.agg(count(lit(1)).as("n_true")))
        .select(lit(dm.toLong).as("dim"), col("n_true"), col("n_hits"),
          (floor(col("n_hits") * lit(10000.0) / col("n_true") + lit(0.5))
            / lit(10000.0)).as("recall"))
    }.reduce(_ unionByName _)
  }

  /** Contrastive hard-negative mining: per query, the top-k
    * most-cosine-similar corpus vectors carrying a DIFFERENT label —
    * the "closest wrong answers" a contrastive/triplet trainer wants
    * as negatives (in-batch random negatives are mostly easy; the
    * gradient lives in the hard ones). Same scale shape as
    * [[bruteForceTopK]]: the query set broadcasts, the corpus never
    * shuffles, the label mismatch prunes BEFORE the cosine is
    * evaluated, and the per-query top-k plans as WindowGroupLimit
    * (partial top-k below the exchange). Output: (query_id, rank,
    * nbr_id, nbr_label, sim).
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int,
                    labelCol: String = "label"): DataFrame = {
    val c = corpus.select(col("vec_id").as("nbr_id"),
      col(labelCol).as("nbr_label"), col("embedding").as("c_emb"))
    val q = queries.select(col("vec_id").as("query_id"),
      col(labelCol).as("q_label"), col("embedding").as("q_emb"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("nbr_label") =!= col("q_label"))
      .withColumn("sim", VectorFunctions.cosineRounded(col("q_emb"), col("c_emb"), 4))
      .select("query_id", "nbr_id", "nbr_label", "sim")
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("nbr_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("nbr_id"), col("nbr_label"), col("sim"))
  }

  /** Approximate top-k via multi-table SRP-LSH.
    *
    * Corpus explodes to `tables` (nbr_id, bucket) rows — ids only, the
    * embedding array never rides the exploded shuffle. Candidates are
    * the distinct (query, nbr) pairs sharing any table's bucket; the
    * embedding is joined back just for the candidate set, which is a
    * tiny fraction of |corpus| × |queries|. Defaults are tuned for
    * ~0.3-cosine neighbors (random-ish corpora): 4 planes × 8 tables
    * ≈ 0.67 expected candidate recall.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              planes: Int = 4, tables: Int = 8, maxBucket: Int = 4096): DataFrame = {
    val buckets = VectorFunctions.srpBuckets(col("embedding"), planes, tables)
    val c = corpus.select(col("vec_id").as("nbr_id"), explode(buckets).as("bucket"))
    // hot-bucket guard: a degenerate bucket (zero vectors, tight
    // cluster) must not fan out |bucket|×|queries| candidates. The
    // per-bucket count aggregates down to ≤ tables·2^planes rows, so
    // the semi-join broadcasts and the corpus side never shuffles.
    val smallBuckets = c.groupBy("bucket").agg(count(lit(1)).as("n"))
      .filter(col("n") <= maxBucket).select("bucket")
    val q = queries.select(col("vec_id").as("query_id"),
      explode(buckets).as("bucket"))
    val cand = c.join(broadcast(smallBuckets), Seq("bucket"), "left_semi")
      .join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("nbr_id"))
      .select("query_id", "nbr_id").distinct()
    val scored = cand
      .join(broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("q_emb"))), Seq("query_id"))
      .join(corpus.select(col("vec_id").as("nbr_id"),
        col("embedding").as("c_emb")), Seq("nbr_id"))
      .withColumn("sim", VectorFunctions.cosineRounded(col("q_emb"), col("c_emb"), 4))
      .select("query_id", "nbr_id", "sim")
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("nbr_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("nbr_id"), col("sim"))
  }

  /** SRP plane count for a target mean bucket size: 2^planes buckets
    * per table, so planes = ⌈log2(n/target)⌉. A FIXED plane count is
    * the same scale bug SemDeDup's fixed cell count was: mean bucket
    * size grows linearly with the corpus and the in-bucket pair grid
    * quadratically (measured 36.7 s at 200k vectors with planes=10 —
    * mean bucket ≈195 — vs seconds auto-scaled). Exact/scaled
    * duplicates (cosine 1) share every sign bit, so THEIR recall is
    * invariant to planes; for merely-near pairs recall per table is
    * p^planes (p = 1−θ/π), so when planes rises with the corpus,
    * `tables` is the knob that buys the recall back — the standard
    * LSH pairing. Clamped to [10, 24] (bucket ids pack as
    * (table << planes) | bits in a long).
    */
  def autoPlanes(n: Long, targetBucket: Int = 32): Int =
    math.max(10, math.min(24,
      math.ceil(math.log(math.max(1.0, n.toDouble / targetBucket)) / math.log(2.0)).toInt))

  /** [[nearDupByEmbedding]] with the plane count scaled to the corpus
    * (one count — a parquet metadata read).
    */
  def nearDupByEmbeddingAuto(corpus: DataFrame, threshold: Double = 0.95,
                             tables: Int = 4, maxBucket: Int = 256): DataFrame =
    nearDupByEmbedding(corpus, threshold, autoPlanes(corpus.count()), tables, maxBucket)

  /** Embedding-cosine near-duplicate summary: docs whose nearest
    * neighbor (by LSH bucket) exceeds `threshold`. One row per vector.
    */
  def nearDupByEmbedding(corpus: DataFrame, threshold: Double = 0.95,
                         planes: Int = 10, tables: Int = 4,
                         maxBucket: Int = 256): DataFrame = {
    val buckets = VectorFunctions.srpBuckets(col("embedding"), planes, tables)
    val b = corpus.select(col("vec_id"), explode(buckets).as("bucket"))
    val emb = corpus.select(col("vec_id"), col("embedding"))
    // two-phase capped-bucket pair generation (see
    // MinHashLSH.candidatePairs): a codegen'd count finds the
    // 2..maxBucket buckets, then ONLY those collect — a degenerate
    // bucket (zero vectors, a tight cluster) is dropped by its exact
    // count and never materializes O(n²) pairs or an unbounded
    // aggregation buffer
    val hot = b.groupBy("bucket").agg(count(lit(1)).as("__n"))
      .filter(col("__n").between(2, maxBucket))
      .select("bucket")
    val grouped = b.join(hot, Seq("bucket"), "left_semi")
      .groupBy("bucket")
      // collect_min_k: bounded buffer (defense-in-depth) + sorted out
      .agg(call_function("collect_min_k", col("vec_id"), lit(maxBucket + 1)).as("ids"))
    val pairs = grouped
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
           transform(slice(ids, i + 2, size(ids)), y -> struct(x AS id_a, y AS id_b))))"""))
        .as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()
      .join(emb.select(col("vec_id").as("id_a"), col("embedding").as("e_a")), Seq("id_a"))
      .join(emb.select(col("vec_id").as("id_b"), col("embedding").as("e_b")), Seq("id_b"))
      .withColumn("sim", VectorFunctions.cosineRounded(col("e_a"), col("e_b"), 4))
      .select(col("id_a"), col("id_b"), col("sim"))
    val sym = pairs.select(col("id_a").as("vec_id"), col("id_b").as("other_id"), col("sim"))
      .union(pairs.select(col("id_b").as("vec_id"), col("id_a").as("other_id"), col("sim")))
    val best = sym.groupBy("vec_id").agg(
      max(struct(col("sim"), col("other_id"))).as("best"))
      .select(col("vec_id"), col("best.other_id").as("nearest_id"),
        col("best.sim").as("nearest_sim"))
    corpus.select("vec_id").join(best, Seq("vec_id"), "left")
      .na.fill(Map("nearest_sim" -> -1.0))
      .withColumn("is_near_dup", col("nearest_sim") >= threshold)
  }
}
