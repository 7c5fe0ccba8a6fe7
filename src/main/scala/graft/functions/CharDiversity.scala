package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Character-diversity quality signals — the char-level gibberish /
  * spam screen ("aaaaaa…", binary junk, single-char floods) that
  * token-level filters miss because such text often tokenizes into
  * one enormous "word". Reports per document:
  *
  *  - `n_chars`, `distinct_chars`, `max_char_n` (the modal char's
  *    count — Gopher-style max-fraction screens divide this by n);
  *  - `simpson` = Σ cᵢ²/n² (4 dp), the Simpson concentration index:
  *    1/n-floored for perfectly diverse text, → 1.0 for single-char
  *    floods. Chosen over Shannon entropy DELIBERATELY: it is a
  *    RATIONAL statistic of exact integer counts (one IEEE division
  *    + floor — bit-identical in any engine), where entropy's ln()
  *    is libm-dependent and can flip a rounded boundary.
  *
  * Shape at scale: ZERO shuffle — the whole report is one native
  * [[CharDiversityStats]] histogram pass per row (a tight code-point
  * loop; the builtin HOF form below allocates a String per char and
  * comparison-sorts it — measured 24.1 s vs 0.22 s at sf10). The oracle
  * mirrors it as an explode + groupBy, which is the same integers by
  * a different plan, and [[reportHof]] keeps the HOF fold as a THIRD
  * independent implementation pinned bit-identical in FunctionsSpec.
  */
object CharDiversity {

  private val stateT =
    "struct<prev:string,run:bigint,sumsq:bigint,dist:bigint,maxrun:bigint>"

  /** The per-text signal columns; `text` must be non-null. */
  def report(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), col(textCol))
      .withColumn("__st", call_function("char_diversity_stats", col(textCol)))
      .select(col(idCol),
        col("__st")("n_chars").as("n_chars"),
        col("__st")("distinct_chars").as("distinct_chars"),
        col("__st")("max_char_n").as("max_char_n"),
        when(col("__st")("n_chars") === 0L, lit(0.0)).otherwise(
          floor(col("__st")("sumsq").cast("double")
            / (col("__st")("n_chars").cast("double") * col("__st")("n_chars"))
            * lit(10000.0) + lit(0.5)) / lit(10000.0)).as("simpson"))

  /** The builtin-composition form of [[report]] (sorted-run HOF
    * fold) — kept as the independent witness implementation; the
    * bit-identity spec runs both over the same corpus.
    */
  private[graft] def reportHof(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), col(textCol))
      // sequence(1, 0) steps BACKWARD ([1, 0]) in Spark, so empty
      // texts need the explicit empty-array branch
      .withColumn("__cs", when(length(col(textCol)) === 0,
          array().cast("array<string>"))
        .otherwise(array_sort(transform(
          sequence(lit(1), length(col(textCol))),
          i => substring(col(textCol), i, lit(1))))))
      .withColumn("__st", aggregate(
        col("__cs"),
        expr(s"cast(struct('', 0L, 0L, 0L, 0L) as $stateT)"),
        (st, c) => when(c === st("prev"),
            struct(st("prev").as("prev"), (st("run") + 1L).as("run"),
              st("sumsq").as("sumsq"), st("dist").as("dist"),
              st("maxrun").as("maxrun")))
          .otherwise(
            struct(c.as("prev"), lit(1L).as("run"),
              (st("sumsq") + st("run") * st("run")).as("sumsq"),
              (st("dist") + when(st("run") > 0L, 1L).otherwise(0L)).as("dist"),
              greatest(st("maxrun"), st("run")).as("maxrun"))),
        st => struct(
          (st("sumsq") + st("run") * st("run")).as("sumsq"),
          (st("dist") + when(st("run") > 0L, 1L).otherwise(0L)).as("dist"),
          greatest(st("maxrun"), st("run")).as("maxrun"))))
      .select(col(idCol),
        length(col(textCol)).cast("long").as("n_chars"),
        col("__st")("dist").as("distinct_chars"),
        col("__st")("maxrun").as("max_char_n"),
        when(length(col(textCol)) === 0, lit(0.0)).otherwise(
          floor(col("__st")("sumsq").cast("double")
            / (length(col(textCol)).cast("double") * length(col(textCol)))
            * lit(10000.0) + lit(0.5)) / lit(10000.0)).as("simpson"))

  /** Flag rows whose modal char exceeds `maxFrac` of the text or
    * whose Simpson concentration exceeds `maxSimpson` — the drop
    * rule a cleaning pipeline applies on top of [[report]].
    */
  def flagged(docs: DataFrame, idCol: String, textCol: String,
              maxFrac: Double = 0.2, maxSimpson: Double = 0.1): DataFrame =
    report(docs, idCol, textCol)
      .withColumn("flagged",
        col("n_chars") > 0 &&
          (col("max_char_n").cast("double") / col("n_chars") > maxFrac ||
           col("simpson") > maxSimpson))
}
