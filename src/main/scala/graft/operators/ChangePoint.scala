package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Level-shift (change-point) detection on keyed event streams — the
  * two-window z-test: for every day, compare the mean of the NEXT `w`
  * days (current included) against the mean of the PREVIOUS `w` days,
  * standardized by the two windows' pooled variance. Days where |z|
  * crosses the threshold mark a level shift — the classic monitoring
  * pass for ingest-volume regressions and crawl-source outages
  * (CUSUM's windowed cousin; unlike CUSUM it is expressible as plain
  * window frames, so it runs identically in any engine).
  *
  * Scale shape: events partial-aggregate to (key, day) counts — the
  * ONLY corpus-sized exchange; the dense day grid (gaps must be
  * explicit zeros or ROWS frames slip) comes from
  * [[Resample.gapFill]], and the two frames scan each key's
  * days-sized series in partition. Variance derives from exact
  * integer moment sums (Σn, Σn²), so summation order cannot bend it;
  * the n² long bound (n/day < 3e9 per key) is comfortably above any
  * real per-key daily count.
  */
object ChangePoint {

  /** Per-(key, day) shift scores over daily EVENT VOLUMES (the
    * integer count — exact moments; a float metric would reintroduce
    * engine-dependent summation order). Output: keyCols + day
    * (yyyy-MM-dd string) + n_events + z (4dp) + is_change
    * (|z| >= threshold on the ROUNDED z, so the boundary is
    * engine-independent). Only days with both windows complete
    * (w rows each) are emitted.
    */
  def meanShift(df: DataFrame, keyCols: Seq[String], tsCol: String,
      w: Int, zThreshold: Double): DataFrame = {
    val k = keyCols.map(col)
    // gapFill needs a numeric column to carry; the detector reads only
    // the count n, so feed it a constant rather than implying a metric
    val daily = Resample.gapFill(df.withColumn("__one", lit(1.0)),
      keyCols, tsCol, "__one", grain = "day")
    val pre = Window.partitionBy(k: _*).orderBy(col("bucket"))
      .rowsBetween(-w, -1)
    val post = Window.partitionBy(k: _*).orderBy(col("bucket"))
      .rowsBetween(0, w - 1)
    val framed = daily.select(k ++ Seq(col("bucket"), col("n"),
      count(col("n")).over(pre).as("c_pre"),
      sum(col("n")).over(pre).as("s_pre"),
      sum(col("n") * col("n")).over(pre).as("q_pre"),
      count(col("n")).over(post).as("c_post"),
      sum(col("n")).over(post).as("s_post"),
      sum(col("n") * col("n")).over(post).as("q_post")): _*)
    // population variance from integer moments; the double expression
    // tree mirrors the oracle SQL operation-for-operation
    def mean(s: Column): Column = s.cast("double") / w
    def pvar(q: Column, s: Column): Column =
      (q.cast("double") - s.cast("double") * s / w) / w
    val z = (mean(col("s_post")) - mean(col("s_pre"))) /
      sqrt((pvar(col("q_pre"), col("s_pre")) +
        pvar(col("q_post"), col("s_post"))) / w + lit(1e-9))
    val zr = floor(z * lit(10000.0) + lit(0.5)) / lit(10000.0)
    framed
      .filter(col("c_pre") === w && col("c_post") === w)
      .select(k ++ Seq(
        date_format(col("bucket"), "yyyy-MM-dd").as("day"),
        col("n").as("n_events"),
        zr.as("z"),
        (abs(zr) >= zThreshold).as("is_change")): _*)
  }
}
