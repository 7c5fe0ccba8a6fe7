package graft.dedup

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate detection.
  *
  * Pipeline: word-k-shingles → n minhash values (one per hash
  * function) → b bands of r rows → hash each band → self-join on
  * (band_id, band_hash) → candidate pairs → exact Jaccard
  * verification on the shingle sets.
  *
  * Scale design (the whole point of LSH at 100 TB):
  *  - Signature computation is narrow and codegen'd: nested
  *    higher-order `transform` over `xxhash64(shingle, seed)` — the
  *    hash family is "xxhash64 of (value, seed)", no random
  *    parameters to broadcast.
  *  - The only shuffle is on (band_id, band_hash) — b rows per doc,
  *    fixed width. Never a full cross-join; candidate generation is
  *    equality-join colocated by bucket.
  *  - Bucket-skew guard: buckets larger than `maxBucket` are dropped
  *    (a bucket that huge means a degenerate band — at web scale a
  *    single hot bucket would otherwise produce O(n²) pairs on one
  *    task). AQE skew-join handles moderate skew below the cap.
  */
object MinHashLSH {

  /** doc_id, sh_hashes (set of 64-bit shingle hashes), sig
    * (array<long> of length numHashes).
    *
    * Shape chosen for scale: each shingle string is hashed ONCE
    * (xxhash64) right after the explode, then (a) the n-hash minhash
    * family is n cheap long-rehashes inside a partial-aggregated
    * groupBy — min(rehash(h,s)) per s — and (b) the exact-Jaccard
    * verification set rides the SAME groupBy as collect_set(h). The
    * shingle strings never enter a shuffle; one aggregation produces
    * both signature and verification payload. (The naive form —
    * `array_min(transform(shingles, sh => xxhash64(sh, s)))` per s —
    * re-hashes every shingle STRING n times per row, and a
    * single-row-group input would compute it all on one core, hence
    * also the explicit repartition.)
    */
  def signatures(docs: DataFrame, idCol: String, textCol: String,
                 shingleK: Int = 3, numHashes: Int = 64): DataFrame = {
    val n = docs.sparkSession.sparkContext.defaultParallelism
    val hashed = docs.select(
      col(idCol).as("doc_id"),
      TextFunctions.shingles(col(textCol), shingleK).as("shingles"))
      .repartition(n)
      .select(col("doc_id"), explode_outer(col("shingles")).as("sh"))
      .select(col("doc_id"), xxhash64(col("sh")).as("h"))
    val minCols = (0 until numHashes).map(s => min(xxhash64(col("h"), lit(s))).as(s"m$s"))
    val aggs = minCols :+ collect_set(col("h")).as("sh_hashes")
    hashed.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"), col("sh_hashes"),
        array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** Explode signatures into (band_id, band_hash, doc_id). */
  def bands(sigs: DataFrame, numBands: Int, rowsPerBand: Int): DataFrame =
    sigs.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(numBands - 1)),
        b => xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))))
        .as(Seq("band_id", "band_hash")))

  /** Candidate pairs (a < b) from shared LSH buckets. */
  def candidatePairs(bandsDf: DataFrame, maxBucket: Int = 64): DataFrame = {
    val sized = bandsDf
      .withColumn("bucket_size",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("band_id", "band_hash")))
      .filter(col("bucket_size") <= maxBucket)
      .drop("bucket_size")
    sized.as("l").join(sized.as("r"),
        col("l.band_id") === col("r.band_id") &&
        col("l.band_hash") === col("r.band_hash") &&
        col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("id_a"), col("r.doc_id").as("id_b"))
      .distinct()
  }

  /** Exact Jaccard over shingle-hash sets for verified pairs (64-bit
    * hash collisions are negligible next to shingling noise, and long
    * arrays intersect far cheaper than string arrays).
    */
  def verifiedPairs(sigs: DataFrame, pairs: DataFrame, threshold: Double): DataFrame = {
    val a = sigs.select(col("doc_id").as("id_a"), col("sh_hashes").as("sh_a"))
    val b = sigs.select(col("doc_id").as("id_b"), col("sh_hashes").as("sh_b"))
    pairs.join(a, "id_a").join(b, "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("jaccard", round(col("inter") / col("uni"), 4))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Per-document near-dup summary: candidate count, best match and
    * its Jaccard. Always one row per input document (so downstream
    * checks see a stable, non-empty result even on dup-free corpora).
    */
  def nearDupSummary(docs: DataFrame, idCol: String, textCol: String,
                     shingleK: Int = 3, numHashes: Int = 64,
                     numBands: Int = 16, threshold: Double = 0.5): DataFrame = {
    val rowsPerBand = numHashes / numBands
    val sigs = signatures(docs, idCol, textCol, shingleK, numHashes).cache()
    val pairs = candidatePairs(bands(sigs, numBands, rowsPerBand))
    val verified = verifiedPairs(sigs, pairs, threshold = 0.0)
    val sym = verified.select(col("id_a").as("doc_id"), col("id_b").as("other_id"), col("jaccard"))
      .union(verified.select(col("id_b").as("doc_id"), col("id_a").as("other_id"), col("jaccard")))
    val best = sym.groupBy("doc_id").agg(
      count(lit(1)).as("n_candidates"),
      max(struct(col("jaccard"), col("other_id"))).as("best"))
      .select(col("doc_id"), col("n_candidates"),
        col("best.other_id").as("best_match_id"),
        col("best.jaccard").as("best_jaccard"),
        (col("best.jaccard") >= threshold).as("is_near_dup"))
    sigs.select("doc_id").join(best, Seq("doc_id"), "left")
      .na.fill(Map("n_candidates" -> 0L))
      .na.fill(Map("best_jaccard" -> -1.0))
      .withColumn("is_near_dup", coalesce(col("is_near_dup"), lit(false)))
  }
}
