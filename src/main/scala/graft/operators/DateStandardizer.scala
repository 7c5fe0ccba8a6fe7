package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RN-001: multi-format date standardization to ISO dates.
  *
  * Reference: src/silver/job-silver-rues.py:319-354 — each raw date
  * string may be `yyyyMMdd` (8 digits) or a slash timestamp
  * `yyyy/MM/dd HH:mm:ss.SSSSSSSSS`; anything else becomes NULL.
  *
  * Implemented as a single coalesce of codegen'd builtins (rlike /
  * to_date / to_timestamp) — a narrow per-row expression with no
  * shuffle, which whole-stage codegen fuses into the scan at any
  * scale.
  */
object DateStandardizer {

  /** The parsing expression for one raw string column. `try_to_*`
    * variants, not `to_*`: under Spark 4's default ANSI mode the
    * plain parsers THROW on guard-passing-but-invalid values (e.g.
    * '20231345', month 13) — and malformed values are exactly what
    * this operator exists to absorb as NULL.
    */
  def parseDate(c: Column): Column = {
    // every guard tests the TRIMMED value (a whitespace-padded
    // ' 20230115' must parse, not fall through to NULL); the anchored
    // regex subsumes the length check
    val t = trim(c)
    coalesce(
      when(t.rlike("^[0-9]{8}$"),
        try_to_timestamp(t, lit("yyyyMMdd")).cast("date")),
      when(t.contains("/"),
        try_to_timestamp(substring(t, 1, 19), lit("yyyy/MM/dd HH:mm:ss")).cast("date")),
      lit(null).cast("date")
    )
  }

  /** Replace each named string column with its parsed date, keeping
    * the column name (reference drops + renames; a single projection
    * here).
    */
  def standardize(df: DataFrame, dateCols: Seq[String]): DataFrame = {
    val present = dateCols.filter(df.columns.contains).toSet
    val cols = df.columns.map { c =>
      if (present(c)) parseDate(col(c)).as(c) else col(c)
    }
    df.select(cols.toIndexedSeq: _*)
  }
}
