package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pre-flight shuffle-skew profiler: before keying a 100 TB join or
  * aggregation on a column, measure HOW skewed the key actually is
  * and get a concrete salt factor for [[SkewJoin]] — the advisory
  * step that decides between a plain shuffle, AQE skew handling, and
  * explicit salting.
  *
  * One row out: total rows, distinct keys, mean rows/key, the hot
  * key and its count, `skew_factor` = max_count / mean (1.0 ⇒
  * perfectly even), and `recommended_salt` = ceil(skew_factor) —
  * spreading the hot key over that many salt buckets caps its bucket
  * at roughly the mean, which is the point of salting.
  *
  * Scale design: the per-key count is ONE key-shuffled exchange with
  * map-side combine (the same exchange the prospective join would
  * pay, at a fraction of the bytes — counts only, no payload); the
  * reduction to one advisory row is a 1-row aggregate. For a cheaper
  * pre-flight at extreme scale, `sampleFrac` < 1 profiles a
  * deterministic portable-hash sample (md5 draw — retry-stable, no
  * RNG state): counts scale by 1/frac but skew_factor and the salt
  * recommendation are ratio-based, so they survive sampling
  * unbiased.
  *
  * Cross-engine determinism: the hot key breaks count ties toward
  * the LARGEST key (max over a (count, key) struct — mirrored as
  * ORDER BY cnt DESC, key DESC LIMIT 1); ratio doubles are one IEEE
  * division of exact integers, rounded via the floor(+0.5) scheme.
  */
object SkewAdvisor {

  private def r4(c: Column): Column = floor(c * 1e4 + lit(0.5)) / 1e4

  /** Profile the skew of `df` keyed by `keyCol` (cast to string for
    * a key-type-agnostic report). `idCol` feeds the portable sample
    * draw when `sampleFrac` < 1.
    */
  def profile(df: DataFrame, keyCol: String, idCol: String,
              sampleFrac: Double = 1.0, salt: Int = 0): DataFrame = {
    require(sampleFrac > 0 && sampleFrac <= 1.0, s"sampleFrac out of range: $sampleFrac")
    val in =
      if (sampleFrac >= 1.0) df
      else df.filter(Sampling.portableUniform(idCol, salt) < sampleFrac)
    val counts = in.groupBy(col(keyCol).cast("string").as("__k"))
      .agg(count(lit(1)).as("__cnt"))
    counts.agg(
        sum(col("__cnt")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("__cnt")).as("max_count"),
        max(struct(col("__cnt"), col("__k"))).as("__hot"))
      .select(
        col("n_rows"), col("n_keys"),
        r4(col("n_rows").cast("double") / col("n_keys")).as("avg_per_key"),
        col("max_count"),
        col("__hot.__k").as("hot_key"),
        r4(col("max_count").cast("double") * col("n_keys") / col("n_rows"))
          .as("skew_factor"),
        ceil(col("max_count").cast("double") * col("n_keys") / col("n_rows"))
          .cast("long").as("recommended_salt"))
  }
}
