package graft.sources

import org.apache.spark.sql.SparkSession

import graft.Tables

/** Managed-catalog star schema: the reference's gold jobs read silver
  * through the Glue Data Catalog rather than raw paths (reference:
  * src/gold/job-gold-rues.py:61-78); the Spark-native equivalent is
  * bucketed managed tables. Orders and customer are bucketed on
  * custkey at write time, so every later customer-grain equi-join or
  * aggregation is exchange-free — pay the 100 TB shuffle once at
  * ingest, never per query.
  */
object CatalogStar {

  /** Register the star schema for `sfDir` as managed tables in a
    * per-dir database (idempotent within a session; Overwrite makes a
    * re-registration after a stale warehouse dir safe). Returns the
    * database name; tables: orders, customer (bucketed by custkey),
    * nation (small dim, unbucketed).
    */
  def ensure(spark: SparkSession, sfDir: String, buckets: Int = 8): String = synchronized {
    val db = ("graft_star_" + sfDir.replaceAll("[^a-zA-Z0-9]", "_")).toLowerCase
    if (!spark.catalog.databaseExists(db)) {
      // the default catalog is in-memory but the warehouse DIRECTORY
      // persists across JVMs: a stale location from a previous run
      // fails CREATE TABLE with LOCATION_ALREADY_EXISTS — remove it
      val dbPath = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), s"$db.db")
      val fs = dbPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(dbPath)) fs.delete(dbPath, true)
      spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
      Writers.bucketedTable(Tables.orders(spark, sfDir), s"$db.orders",
        Seq("o_custkey"), buckets)
      Writers.bucketedTable(Tables.customer(spark, sfDir), s"$db.customer",
        Seq("c_custkey"), buckets)
      Tables.nation(spark, sfDir).write
        .mode(org.apache.spark.sql.SaveMode.Overwrite).saveAsTable(s"$db.nation")
    }
    db
  }
}
