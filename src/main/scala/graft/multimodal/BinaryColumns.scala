package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media are opaque `binary` payload columns + typed metadata
  * structs. The Spark-side machinery (schema, partition sizing, batch
  * iteration shape) is real; the actual codec work is STUBBED with a
  * deterministic fake (`???`-equivalent) because no image/audio
  * libraries ship in this environment — on a real cluster the stub
  * body is replaced by the decoder call, nothing else changes.
  *
  * Scale notes: payloads are large, so (a) metadata-only operations
  * must never touch the payload column (column pruning — keep payload
  * in its own struct-free column), and (b) per-row work runs via
  * `mapPartitions` over an iterator so one task holds O(1) payloads
  * in memory, not O(partition).
  */
object BinaryColumns {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("codec", StringType, nullable = true)
    )), nullable = true)
  ))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("content_hash", LongType, nullable = false),
    StructField("feature", ArrayType(FloatType), nullable = true)
  ))

  /** Deterministic synthetic media table (payload = seeded bytes) for
    * tests — stands in for a real binary-file ingest.
    */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame =
    spark.range(n.toLong).select(
      col("id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("id"), lit(3)) + 1).cast("int")).as("media_type"),
      // payload: hash-derived bytes; unhex gives a binary column
      unhex(substring(repeat(md5(col("id").cast("string")), 8), 1, 256)).as("payload"),
      struct(lit(64).as("width"), lit(64).as("height"),
        lit(1000L).as("duration_ms"), lit("fake").as("codec")).as("meta"))

  /** STUB — replace with the real decoder (e.g. javax.imageio /
    * ffmpeg bindings) on a cluster with codec libs. The fake derives
    * a deterministic "feature" from payload bytes so the distributed
    * plumbing (schema, batching, partition shape) is fully exercised
    * and testable.
    */
  def decodeStub(payload: Array[Byte], mediaType: String): Array[Float] = {
    val h = java.util.Arrays.hashCode(payload)
    Array.tabulate(8)(i => ((h >>> (i * 4)) & 0xF).toFloat / 15.0f)
  }

  /** Feature extraction over an iterator of rows — the mapPartitions
    * pattern a real decoder would use (amortizes decoder init per
    * partition, streams rows, never materializes the partition).
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    media.select("media_id", "media_type", "payload")
      .mapPartitions { rows =>
        // decoder init would happen here, once per partition
        rows.map { r =>
          val payload = Option(r.getAs[Array[Byte]]("payload")).getOrElse(Array.emptyByteArray)
          val mt = r.getAs[String]("media_type")
          Row(r.getAs[Long]("media_id"), mt,
            payload.length.toLong,
            java.util.Arrays.hashCode(payload).toLong,
            decodeStub(payload, mt))
        }
      }(enc)
  }

  /** Frame sampling for video-typed media: emit `n` evenly-spaced
    * "frames" per payload. The frame extraction itself is STUBBED
    * (payload byte-slices stand in for decoded frames); the Spark
    * side — one row per (media, frame_idx) via a lateral explode,
    * frame byte budget bounded per row — is the real shape a
    * 100 TB video pipeline needs (frames explode 10-100×, so
    * downstream must never carry the source payload alongside).
    */
  def sampleFrames(media: DataFrame, n: Int): DataFrame =
    media.filter(col("media_type") === "video")
      .select(col("media_id"),
        posexplode(transform(sequence(lit(0), lit(n - 1)), i => {
          val len = length(col("payload"))
          // stub "frame": a 16-byte slice at position i/n of the payload
          substring(col("payload"), (i * greatest(len / n, lit(1)) + 1).cast("int"), lit(16))
        })).as(Seq("frame_idx", "frame")))
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("frame"), length(col("frame")).cast("long").as("frame_bytes"))

  /** Metadata-only projection — must not deserialize payloads
    * (verify with explain: ReadSchema excludes `payload`).
    */
  def metadataSummary(media: DataFrame): DataFrame =
    media.groupBy("media_type").agg(
      count(lit(1)).as("n_media"),
      avg(col("meta.width")).as("avg_width"),
      avg(col("meta.duration_ms")).as("avg_duration_ms"))
}
