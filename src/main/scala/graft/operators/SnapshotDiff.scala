package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot differencing — derive a change feed (insert/update/delete)
  * from two full table versions. The inverse of `Upsert`: where Upsert
  * applies a changelog to a snapshot, this recovers the changelog two
  * snapshots imply, which is how pipelines without CDC at the source
  * bootstrap incremental processing.
  *
  * Shape at scale: one full-outer sort-merge join keyed on the primary
  * key (AQE handles skew); row comparison is a single null-safe struct
  * equality — no per-column join conditions, no second pass. Unchanged
  * rows (the overwhelming majority between adjacent 100 TB snapshots)
  * are filtered before anything downstream sees them.
  */
object SnapshotDiff {

  /** Rows of `newSnap` minus/changed-from `oldSnap`, classified.
    * Output: key columns + change_type ('insert'|'update'|'delete').
    * `compareCols` defaults to every non-key column present in BOTH
    * snapshots (schema evolution: added/dropped columns don't break
    * the diff, they just don't participate in change detection).
    */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, keys: Seq[String],
           compareCols: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "snapshot diff needs at least one key column")
    val cmp =
      if (compareCols.nonEmpty) compareCols
      else oldSnap.columns.intersect(newSnap.columns).filterNot(keys.contains).toSeq
    val o = oldSnap.select((keys ++ cmp).map(col): _*)
      .withColumn("__o", lit(true))
      .withColumnsRenamed(cmp.map(c => c -> s"__old_$c").toMap)
    val n = newSnap.select((keys ++ cmp).map(col): _*)
      .withColumn("__n", lit(true))
    val oldVal = struct(cmp.map(c => col(s"__old_$c")): _*)
    val newVal = struct(cmp.map(col): _*)
    o.join(n, keys, "full_outer")
      .withColumn("change_type",
        when(col("__o").isNull, "insert")
          .when(col("__n").isNull, "delete")
          .when(!(oldVal <=> newVal), "update"))
      .filter(col("change_type").isNotNull)
      .select(keys.map(col) :+ col("change_type"): _*)
  }
}
