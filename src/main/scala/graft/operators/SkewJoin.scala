package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys.
  *
  * AQE's skew-join split handles moderate skew transparently, but a
  * pathological hot key (one key = 30% of a 100 TB fact table) still
  * lands every post-split partition of that key against the SAME
  * build rows. Salting breaks the key space explicitly: the big side
  * gets a per-row salt in [0, salt), the small side is replicated
  * `salt` ways, and the join key becomes (key, salt) — the hot key
  * now spreads over `salt` reducers. Cost: small side × salt, so use
  * only when the small side is genuinely small (it usually rides a
  * broadcast anyway — salting matters when the small side is too big
  * to broadcast but far smaller than the fact).
  *
  * Result set is IDENTICAL to the unsalted join (salt values pair
  * exactly once), which is what the oracle checks.
  */
object SkewJoin {

  /** Inner equi-join of `big` (skewed) with `small` on `keys`,
    * salted `salt` ways.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    // row-spread salt: deterministic-output (any spread yields the
    // same join result), cheap, and independent of the key value
    val salted = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salt.toLong)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** Convenience single-key overload. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame =
    saltedJoin(big, small, Seq(key), salt)
}
