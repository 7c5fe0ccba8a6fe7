package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Compression-ratio quality signal: deflate each document and report
  * compressed/raw byte ratio — the "templatedness" proxy used in
  * large-corpus cleaning (highly compressible text is repetitive
  * boilerplate — machine-generated listings, keyword stuffing, menu
  * farms; near-incompressible text is prose or noise). Complements
  * the n-gram repetition stats: zlib's 32 KB window catches LONG-range
  * repetition that bounded n-gram counters cannot.
  *
  * zlib is not expressible in SQL, so this runs via `mapPartitions`
  * (the [[graft.multimodal.BinaryColumns]] precedent): ONE `Deflater`
  * per partition, reset per row — allocation amortizes, the iterator
  * streams, and a task holds O(1) documents. Level and strategy are
  * pinned, so output lengths are deterministic for a given zlib
  * build; the gate is rows-only with the invariants spec-pinned
  * (planted repetitive text compresses far below random text,
  * ratio bounds, empty-doc zero case).
  */
object CompressionQuality {

  private val outSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("raw_bytes", LongType, nullable = false),
    StructField("deflate_bytes", LongType, nullable = false),
    StructField("ratio", DoubleType, nullable = false)))

  /** (id, raw_bytes, deflate_bytes, ratio 4dp) per document; empty
    * docs carry (0, 0, 0.0).
    */
  def scores(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val enc = Encoders.row(outSchema)
    val out = docs.select(col(idCol).cast("long"), col(textCol))
      .mapPartitions { rows =>
        val d = new java.util.zip.Deflater(6)
        // free the native zlib stream when the task ends — finalization
        // would get there eventually, but executors running thousands
        // of tasks should not bank on it
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => d.end()))
        val buf = new Array[Byte](8192)
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = Option(r.getString(1))
            .map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            .getOrElse(Array.emptyByteArray)
          var n = 0L
          if (bytes.nonEmpty) {
            d.reset(); d.setInput(bytes); d.finish()
            while (!d.finished()) n += d.deflate(buf)
          }
          val ratio =
            if (bytes.isEmpty) 0.0
            else math.floor(n.toDouble / bytes.length * 10000.0 + 0.5) / 10000.0
          Row(id, bytes.length.toLong, n, ratio)
        }
      }(enc)
    out.withColumnRenamed("id", idCol)
  }
}
