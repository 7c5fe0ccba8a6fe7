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

  /** The parsing expression for one raw string column. */
  def parseDate(c: Column): Column = coalesce(
    when(length(trim(c)) === 8 && c.rlike("^[0-9]{8}$"),
      to_date(trim(c), "yyyyMMdd")),
    when(c.contains("/"),
      to_date(to_timestamp(substring(trim(c), 1, 19), "yyyy/MM/dd HH:mm:ss"))),
    lit(null).cast("date")
  )

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
