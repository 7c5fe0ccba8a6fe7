package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Robust file readers.
  *
  * Mirrors the ingest surface of the reference bronze layer
  * (reference: src/bronze/job-bronze-rues.py:52-73 reads messy CSV
  * with quotes/escapes/multiline/permissive mode), re-expressed as
  * plain Spark DataFrameReader configuration. At 100 TB the same
  * options apply unchanged — CSV parsing is a narrow, per-file
  * operation that scales with input splits.
  */
object Readers {

  /** CSV with the permissive, quote-safe options a raw landing zone
    * needs. `schema=None` falls back to all-string columns (schema
    * inference requires an extra full pass — never do that at scale,
    * which is also why the reference sets inferSchema=false).
    */
  def csv(
      spark: SparkSession,
      path: String,
      header: Boolean = true,
      sep: String = ",",
      multiLine: Boolean = true,
      schema: Option[StructType] = None,
      inferSchema: Boolean = false,
      maxColumns: Int = -1): DataFrame = {
    val base0 = spark.read
      .option("header", header.toString)
      .option("sep", sep)
      .option("encoding", "UTF-8")
      .option("quote", "\"")
      .option("escape", "\"")
      .option("multiLine", multiLine.toString)
      .option("ignoreLeadingWhiteSpace", "true")
      .option("ignoreTrailingWhiteSpace", "true")
      .option("mode", "PERMISSIVE")
    // parser-width cap (reference bronze sets 50,
    // src/bronze/job-bronze-rues.py:66): a malformed row with runaway
    // separators fails fast instead of allocating unbounded columns
    val base = if (maxColumns > 0) base0.option("maxColumns", maxColumns.toString)
               else base0
    val withSchema = schema match {
      case Some(s) => base.schema(s)
      case None    => base.option("inferSchema", inferSchema.toString)
    }
    withSchema.csv(path)
  }

  /** CSV with corrupt-record QUARANTINE: rows that fail to parse
    * against the typed schema land intact in `_corrupt_record`
    * instead of silently becoming nulls or killing the job — the
    * bronze-layer pattern for a raw landing zone (ingest everything,
    * split good/bad downstream, never lose bytes). Returns the frame
    * with the capture column appended; split with
    * `col("_corrupt_record").isNull` / `.isNotNull`.
    *
    * Caveat encoded here: Spark only populates the capture column if
    * it is present in the supplied schema, and a frame selecting ONLY
    * the capture column must be materialized from the same scan as a
    * data column (both handled by appending the field to the schema).
    */
  def csvWithCorruptCapture(
      spark: SparkSession,
      path: String,
      schema: StructType,
      header: Boolean = true): DataFrame = {
    val withCapture = schema.add("_corrupt_record", org.apache.spark.sql.types.StringType)
    spark.read
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(withCapture)
      .csv(path)
  }

  /** Parquet (columnar) — the bronze/silver/gold interchange format.
    * Filter pushdown + column pruning reach the scan automatically.
    */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** JSON lines. Schema should be supplied at scale (inference = full
    * extra pass over 100 TB).
    */
  def json(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame =
    schema.fold(spark.read.json(path))(s => spark.read.schema(s).json(path))

  /** ORC (columnar) — same pushdown/pruning properties as parquet;
    * kept for interop with ORC-based lakes.
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** XML (Spark 4 built-in source): one row per `rowTag` element.
    * Schema should be supplied at scale — XML inference is a full
    * extra parse pass, and XML itself is a row-oriented interchange
    * format (feeds land in it; analytics storage should not).
    */
  def xml(spark: SparkSession, path: String, rowTag: String,
          schema: Option[StructType] = None): DataFrame = {
    val base = spark.read.option("rowTag", rowTag).format("xml")
    schema.fold(base)(s => base.schema(s)).load(path)
  }
}
