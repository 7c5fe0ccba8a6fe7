package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental snapshot maintenance — the MERGE INTO of a plain-
  * parquet lakehouse: apply a changeset (upserts + tombstones) to a
  * snapshot, producing the next snapshot.
  *
  * Semantics: per key, the row with the highest (version, source)
  * wins — a changeset row at the same version as the snapshot beats
  * it (the changeset is newer information); a winning row whose
  * tombstone flag is set deletes the key.
  *
  * Scale shape: union is free (no shuffle); the per-key winner is a
  * rank-1 window that Spark 4 plans as WindowGroupLimit — each mapper
  * forwards ONE candidate row per key before the single key shuffle.
  * Applying a 1 GB changeset to a 100 TB snapshot costs one shuffle
  * of winner candidates, not a join of the full snapshot.
  */
object Upsert {

  /** `keepTombstones = true` retains the winning tombstone ROW per
    * deleted key instead of dropping the key — required when the
    * result is itself the next snapshot in an incremental chain:
    * without the tombstone, a late out-of-order change with a stale
    * version would resurrect the key on the following merge.
    */
  def apply(snapshot: DataFrame, changes: DataFrame, keyCols: Seq[String],
            versionCol: String, tombstoneCol: Option[String] = None,
            keepTombstones: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty)
    val dead: DataFrame => Column = df =>
      tombstoneCol.map(c => coalesce(df(c), lit(false))).getOrElse(lit(false))
    val unioned =
      snapshot.withColumn("__tomb", dead(snapshot)).withColumn("__src", lit(0))
        .unionByName(
          changes.withColumn("__tomb", dead(changes)).withColumn("__src", lit(1)))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc, col("__src").desc)
    val alive = if (keepTombstones) lit(true) else !col("__tomb")
    unioned
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && alive)
      .drop("__rn", "__tomb", "__src")
  }
}
