package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: left rows with a point
  * timestamp against right rows carrying [start, end) intervals, equi
  * on a key.
  *
  * Spark plans a raw inequality predicate as a broadcast-nested-loop
  * or per-key cartesian — quadratic in the hot key. The scalable
  * composition bins time at `binWidth` granularity: each right
  * interval explodes to the bins it covers (bounded fanout =
  * interval/binWidth + 1), each left point maps to exactly one bin,
  * and the join becomes a plain equi-join on the compact (key, bin)
  * pair followed by the exact interval filter. Shuffle volume is
  * linear, AQE handles residual bin skew.
  */
object RangeJoin {

  def pointInInterval(left: DataFrame, right: DataFrame,
                      leftKey: String, rightKey: String,
                      leftTime: String, rightStart: String, rightEnd: String,
                      binWidth: String = "7 days"): DataFrame = {
    val widthUs = {
      // CalendarInterval → microseconds for day-or-smaller units
      val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
        .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(binWidth))
      require(iv.months == 0, "binWidth must be day-granular or smaller")
      iv.days * 86400000000L + iv.microseconds
    }
    // unix_micros takes TIMESTAMP_LTZ only; NTZ casts through the
    // session zone (UTC everywhere in graft), preserving wall values.
    // Must spell out _ltz: graft sessions set spark.sql.timestampType
    // = TIMESTAMP_NTZ, so a bare "timestamp" cast resolves to NTZ.
    def binOf(c: org.apache.spark.sql.Column) =
      (unix_micros(c.cast("timestamp_ltz")) / widthUs).cast("long")
    // SHUFFLE_HASH on the points side: the planner's size estimate has
    // broadcast a million-row points frame here (building one global
    // hashed relation serially — and at 100 TB a broadcast of either
    // side is fatal). A shuffled hash join on (key, bin) is the scale
    // shape; the points side builds because it is the one that never
    // explodes (each point maps to exactly one bin, intervals fan out
    // interval/binWidth + 1 rows), so its per-partition build is
    // bounded by input/partitions regardless of interval length.
    val l = left.withColumn("__bin", binOf(col(leftTime))).hint("shuffle_hash")
    val r = right.withColumn("__bin",
      explode(sequence(binOf(col(rightStart)), binOf(col(rightEnd)))))
    // df-qualified references throughout: unqualified col(...) would
    // be AMBIGUOUS_REFERENCE whenever both sides share a column name
    // (e.g. joining on a same-named key)
    l.join(r,
        l("__bin") === r("__bin") &&
        l(leftKey) === r(rightKey) &&
        l(leftTime) >= r(rightStart) &&
        l(leftTime) < r(rightEnd))
      .drop(l("__bin")).drop(r("__bin"))
  }
}
