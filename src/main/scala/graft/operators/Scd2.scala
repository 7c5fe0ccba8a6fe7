package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing dimension build: turn a change log (one row
  * per observation of a key's attributes) into effective-dated history
  * rows — the gold-layer pattern for tracking how a dimension evolved.
  *
  * Semantics: per key, order observations by (ts, tieBreak); keep only
  * rows where the tracked attributes actually CHANGED vs the previous
  * observation (null-safe struct compare); each kept row is valid from
  * its ts until the next kept row's ts (open-ended + is_current for
  * the latest).
  *
  * Scale shape: one shuffle on the key; the change-filter and the
  * valid_to lead() share the same (partition, order), so Catalyst
  * reuses one exchange+sort for both window passes. No self-join —
  * the classic SQL formulation joins the table to itself; lag/lead
  * over a single sort is the form that survives a 100 TB changelog.
  */
object Scd2 {

  def build(changes: DataFrame, keyCols: Seq[String], tsCol: String,
            attrCols: Seq[String], tieBreak: Option[String] = None): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty)
    val ordering: Seq[Column] =
      col(tsCol).asc +: tieBreak.map(col(_).asc).toSeq
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ordering: _*)
    val attrs = struct(attrCols.map(col): _*)
    changes
      .withColumn("__prev_attrs", lag(attrs, 1).over(w))
      // null-safe: first observation (null prev) and genuine changes pass
      .filter(!(col("__prev_attrs") <=> attrs))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__prev_attrs")
  }
}
