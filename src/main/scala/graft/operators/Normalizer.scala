package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RN-003: categorical value normalization (trim + uppercase).
  *
  * Reference: src/silver/job-silver-rues.py:360-373. Narrow
  * projection; codegen'd; free at scale.
  */
object Normalizer {

  def normalizeValue(c: Column): Column = upper(trim(c))

  def normalize(df: DataFrame, cols: Seq[String]): DataFrame = {
    val target = cols.filter(df.columns.contains).toSet
    val out = df.columns.map { c =>
      if (target(c)) normalizeValue(col(c)).as(c) else col(c)
    }
    df.select(out.toIndexedSeq: _*)
  }
}
