package graft.operators

import org.apache.spark.sql.DataFrame

/** RN-010: column-name standardization to snake_case.
  *
  * Reference: src/silver/job-silver-rues.py:294-313. The rename is a
  * pure metadata operation (a single projection) — zero data movement
  * at any scale, so one `select` with aliases rather than N chained
  * `withColumnRenamed` (each of which adds an analysis pass).
  */
object ColumnStandardizer {

  def toSnakeCase(name: String): String = {
    val s1 = "(.)([A-Z][a-z]+)".r.replaceAllIn(name, m => m.group(1) + "_" + m.group(2))
    val s2 = "([a-z0-9])([A-Z])".r.replaceAllIn(s1, m => m.group(1) + "_" + m.group(2))
    val s3 = "[\\s\\-\\.]+".r.replaceAllIn(s2, "_")
    // camel-split before a space ("Some Value" → "Some _Value") leaves
    // doubled underscores once the space itself becomes one — collapse.
    val s4 = "_+".r.replaceAllIn(s3, "_")
    s4.toLowerCase
  }

  /** Rename every column to snake_case in one projection. */
  def standardize(df: DataFrame): DataFrame = {
    val renamed = df.columns.map(c => df.col(s"`$c`").as(toSnakeCase(c)))
    df.select(renamed.toIndexedSeq: _*)
  }
}
