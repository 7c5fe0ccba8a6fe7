package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Continuous-ingest deduplication: a STREAM of incoming documents
  * anti-joined against the STATIC historical corpus — the shape a
  * continuous web-crawl pipeline runs forever: every arriving batch
  * keeps only documents whose content hash has never been seen.
  *
  * Structured Streaming executes stream-static left_anti natively
  * (the static side is re-planned per micro-batch), so at 100 TB the
  * static side must be the PRECOMPUTED hash index (an 8-byte-hash
  * parquet table, bucketed by hash so each batch's join prunes), not
  * a rescan of the raw corpus — here the index builds inline because
  * the testdata is unindexed, mirroring [[graft.ann.Ivf]]'s inline
  * assignment note. State is carried by the historical index itself,
  * not stream state, so the query needs no watermark and survives
  * restarts with exactly the index's contents as memory.
  */
object Ingest {

  /** Write `df` as parquet part files named `tag_partNNNNN.parquet`
    * directly inside the stream source dir (file-stream sources list
    * files, not directories).
    */
  private def stageBatch(df: DataFrame, stage: java.nio.file.Path, tag: String): Unit = {
    import java.nio.file.{Files, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    val tmp = stage.resolve(s"__tmp_$tag")
    df.write.mode("overwrite").parquet(tmp.toString)
    val listing = Files.list(tmp)
    val parts =
      try listing.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .toSeq.sortBy(_.getFileName.toString)
      finally listing.close()
    require(parts.nonEmpty, s"staging produced no parquet parts for $tag")
    parts.zipWithIndex.foreach { case (p, i) =>
      Files.move(p, stage.resolve(f"${tag}_part$i%05d.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val walked = Files.walk(tmp)
    try walked.iterator().asScala.toSeq.reverse.foreach(p => Files.deleteIfExists(p))
    finally walked.close()
  }

  /** Real file-stream gate: the incoming feed is staged as TWO
    * deterministic corpus-derived batches — a full RECRAWL (every
    * historical text again under fresh ids; all of it must drop) and
    * a FRESH batch (per-id salted texts; all of it must survive,
    * salt collisions aside, which the text-equality oracle decides
    * identically). Survivors aggregate per source, so a dedup
    * regression in either direction (dropping novel docs / passing
    * recrawled ones) flips both counts and char sums red.
    */
  def ingestDedupFileStream(spark: SparkSession, sfDir: String): DataFrame = {
    import java.nio.file.Files
    import scala.jdk.CollectionConverters._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "source")
    // corpus-derived id offset (the r7 convention: never a magic
    // constant that a bigger SF could collide with)
    val offset = docs.agg(coalesce(max("doc_id"), lit(0L))).head().getLong(0) + 1L
    val stage = Files.createTempDirectory("graft_ingest_dedup")
    try {
      stageBatch(docs.select((col("doc_id") + offset).as("doc_id"),
        col("text"), col("source")), stage, "00_recrawl")
      stageBatch(docs.select((col("doc_id") + lit(2L) * offset).as("doc_id"),
        concat(lit("fresh "), col("doc_id").cast("string"), lit(" "), col("text")).as("text"),
        col("source")), stage, "01_fresh")
      val historical = docs.select(xxhash64(col("text")).as("h")).distinct()
      val incoming = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "64")
        .option("pathGlobFilter", "*.parquet")
        .parquet(stage.toString)
      val novel = incoming.withColumn("h", xxhash64(col("text")))
        .join(historical, Seq("h"), "left_anti")
        .drop("h")
      val name = "graft_ingest_dedup"
      val q = novel.writeStream
        .format("memory").queryName(name)
        .outputMode(OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
      spark.table(name)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text"))).as("n_chars"))
        .localCheckpoint(eager = true)
    } finally {
      val walked = Files.walk(stage)
      try walked.iterator().asScala.toSeq.reverse.foreach(p => Files.deleteIfExists(p))
      finally walked.close()
    }
  }
}
