package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustered writes — multi-dimensional data
  * skipping. A plain sort clusters file-level min/max stats on the
  * lead column only: predicates on the second column still read every
  * file. Interleaving the bit patterns of both columns' bucket ranks
  * and range-partitioning on that curve gives every clustered column
  * locality, so parquet footer stats prune files for predicates on
  * ANY of them — the standard lakehouse layout technique for 100 TB
  * fact tables queried on several independent keys.
  *
  * Bucketing is equi-width over the observed [min, max] (two scalar
  * aggregates — statistics, not data, on the driver). The interleave
  * is pure codegen'd integer arithmetic; the only wide operation is
  * the final range partition, which a clustering write pays anyway.
  */
object ZOrder {

  /** Range-partitioned SORTED write — the single-key layout
    * counterpart to the z-order form: `repartitionByRange` gives
    * files globally disjoint key ranges and the in-partition sort
    * tightens row-group stats, so footer min/max prune both files and
    * row groups for range predicates on THAT key. (One key clustered
    * perfectly vs z-order's several keys clustered adequately — pick
    * per table's dominant predicate.) Range partitioning samples the
    * key distribution, so skewed keys still yield balanced files.
    */
  def rangeSortedWrite(df: DataFrame, path: String, key: String,
                       numFiles: Int): Unit = {
    require(numFiles > 0)
    df.repartitionByRange(numFiles, col(key))
      .sortWithinPartitions(key)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Morton code interleaving `bits`-wide bucket ranks of two columns
    * (bit i of x → bit 2i, bit i of y → bit 2i+1).
    */
  def morton2(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      (shiftright(x, i) % 2) * lit(1L << (2 * i)) +
        (shiftright(y, i) % 2) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)

  /** Equi-width bucket rank of `c` over [lo, hi] into 2^bits buckets. */
  private def rank(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val n = (1 << bits) - 1
    val span = math.max(hi - lo, Double.MinPositiveValue)
    least(greatest(floor((c.cast("double") - lit(lo)) / lit(span) * lit(n + 1)),
      lit(0)), lit(n)).cast("long")
  }

  /** Write `df` clustered on the z-curve of two columns. Returns the
    * output path. At scale the same layout applies unchanged — the
    * range partition bounds file count, footer stats do the pruning.
    */
  def zorderWrite(df: DataFrame, path: String, colA: String, colB: String,
                  numFiles: Int, bits: Int = 8): Unit = {
    require(numFiles > 0 && bits > 0 && bits <= 16)
    val stats = df.agg(
      min(col(colA).cast("double")), max(col(colA).cast("double")),
      min(col(colB).cast("double")), max(col(colB).cast("double"))).head()
    if (stats.isNullAt(0)) {
      // empty input (e.g. a not-yet-populated partition): write the
      // empty dataset rather than NPE on the null min/max
      df.write.mode(SaveMode.Overwrite).parquet(path)
      return
    }
    val (aLo, aHi, bLo, bHi) =
      (stats.getDouble(0), stats.getDouble(1), stats.getDouble(2), stats.getDouble(3))
    df.withColumn("__z", morton2(
        rank(col(colA), aLo, aHi, bits), rank(col(colB), bLo, bHi, bits), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).option("compression", "snappy")
      .parquet(path)
  }
}
