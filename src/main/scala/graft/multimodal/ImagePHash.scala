package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Perceptual-hash near-duplicate detection for IMAGE media — the
  * multimodal analog of the text SimHash family (dedup/SimHash.scala):
  * re-encoded, resized or lightly edited copies of an image survive a
  * byte-level digest change but land within a few bits of each other
  * in perceptual-hash space.
  *
  * The hash is dHash (difference hash): decode, average pixels into a
  * 9x8 luminance grid, and emit bit(r,c) = 1 iff cell (r,c) is darker
  * than its right neighbor — 8 comparisons per row x 8 rows = 64 bits.
  * dHash over aHash on purpose: aHash thresholds every cell against
  * the GLOBAL mean, so one edited region moves every bit's threshold;
  * dHash bits are LOCAL (each depends on two adjacent cells only),
  * which keeps edits bounded — and makes the gate's planted edits
  * ANALYTIC: on a left-to-right luminance gradient every bit is 1,
  * and blacking one interior grid cell flips exactly the one bit
  * entering that cell (the comparison leaving it stays true). All
  * integer math (luma = (299r+587g+114b)/1000, cell = pixel-sum /
  * count), so the hash is bit-deterministic across JVMs.
  *
  * Scale shape (100 TB of images): hashing is one mapPartitions
  * decode pass (O(1) payloads held per task — the BinaryColumns
  * contract); candidate pairs come from a 4x16-bit BAND bucket join
  * on the hash (pigeonhole: hamming <= 3 guarantees two near-dups
  * share at least one band), so the exchange carries (band, hash,
  * id) rows and the verify computes bit_count(xor) only inside
  * buckets — never an all-pairs grid, the exact machinery of the
  * text SimHash operator applied to pixels.
  */
object ImagePHash {

  /** 64-bit difference hash of a decoded image: 9x8 cell grid,
    * bit index r*8+c set iff cell (r,c) is darker than cell (r,c+1).
    * Bit order is row-major from the MSB end so bit (0,0) is bit 63.
    */
  def dHash64(img: java.awt.image.BufferedImage): Long = {
    val (gw, gh) = (9, 8)
    val (w, h) = (img.getWidth, img.getHeight)
    // integer cell luma: sum of pixel lumas / pixel count, cells by
    // index ranges [i*w/gw, (i+1)*w/gw) — exact at any image size
    val cell = Array.ofDim[Long](gh, gw)
    var gy = 0
    while (gy < gh) {
      var gx = 0
      while (gx < gw) {
        val x0 = gx * w / gw; val x1 = ((gx + 1) * w / gw).max(x0 + 1)
        val y0 = gy * h / gh; val y1 = ((gy + 1) * h / gh).max(y0 + 1)
        var acc = 0L
        var y = y0
        while (y < y1 && y < h) {
          var x = x0
          while (x < x1 && x < w) {
            val rgb = img.getRGB(x, y)
            acc += (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF) +
              114 * (rgb & 0xFF)) / 1000
            x += 1
          }
          y += 1
        }
        val n = ((x1.min(w) - x0).max(1)).toLong * ((y1.min(h) - y0).max(1))
        cell(gy)(gx) = acc / n
        gx += 1
      }
      gy += 1
    }
    var hash = 0L
    var r = 0
    while (r < gh) {
      var c = 0
      while (c < 8) {
        hash <<= 1
        if (cell(r)(c) < cell(r)(c + 1)) hash |= 1L
        c += 1
      }
      r += 1
    }
    hash
  }

  private val hashSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("phash", LongType, nullable = true)))

  /** (media_id, phash) for every image row; null phash when the
    * payload doesn't decode. One mapPartitions pass, O(1) payloads
    * per task.
    */
  def hashMedia(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(hashSchema)
    media.filter(col("media_type") === "image")
      .select("media_id", "payload")
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val payload = Option(r.getAs[Array[Byte]]("payload"))
            .getOrElse(Array.emptyByteArray)
          val h = BinaryColumns.decodeImage(payload)
            .map(img => java.lang.Long.valueOf(dHash64(img))).orNull
          Row(r.getAs[Long]("media_id"), h)
        }
      }(enc)
  }

  /** Near-dup pairs (id_a < id_b, hamming <= maxHamming) from a
    * (media_id, phash) frame via the 4x16-bit band bucket join.
    * Sound for maxHamming <= 3 (pigeonhole over 4 bands); tighter
    * thresholds just filter harder inside buckets.
    */
  def nearDupPairs(hashes: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming <= 3, s"4x16-bit banding is only complete to hamming 3, got $maxHamming")
    val banded = hashes.filter(col("phash").isNotNull)
      .select(col("media_id"), col("phash"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            // AND mask, not %: remainder keeps the dividend's sign, so
            // a negative hash's low band would never bucket with the
            // same 16 bits from a positive hash
            shiftrightunsigned(col("phash"), b * 16)
              .bitwiseAND(lit(0xFFFFL)).as("bv"))): _*))
          .as("bb"))
      .select(col("media_id"), col("phash"),
        col("bb.band").as("band"), col("bb.bv").as("bv"))
    val a = banded.select(col("band"), col("bv"),
      col("media_id").as("id_a"), col("phash").as("ph_a"))
    val b = banded.select(col("band"), col("bv"),
      col("media_id").as("id_b"), col("phash").as("ph_b"))
    a.join(b, Seq("band", "bv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("ph_a").bitwiseXOR(col("ph_b"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Planted gate media: `nBase` grayscale left-to-right gradient
    * PNGs (36x32 → exact 4x4 pixel blocks per 9x8 grid cell, min
    * luma 32 so no gradient cell is ever 0), each base distinguished
    * by ONE blacked interior grid cell in its own row. Per base k:
    *   id k      — base (black cell at row k, col 4)
    *   id 100+k  — byte-identical copy               (hamming 0)
    *   id 200+k  — base plus a second black cell at  (hamming 1)
    *               (row (k+4) % 8, col 6)
    * Distinct bases differ in 2 bits (their own flips), so a
    * hamming<=1 screen must return EXACTLY the planted trios — the
    * a-priori oracle the gate pins.
    */
  def plantedGradientMedia(spark: SparkSession, nBase: Int): DataFrame = {
    require(nBase <= 8, "one planted row per base")
    val enc = org.apache.spark.sql.Encoders.row(BinaryColumns.mediaSchema)
    val specs = (0 until nBase).flatMap { k =>
      Seq((k.toLong, k, -1), (100L + k, k, -1), (200L + k, k, (k + 4) % 8))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(specs, 2).map {
      case (id, k, extraRow) =>
        val (w, h) = (36, 32)
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            // grayscale gradient 32..250: strictly increasing cell
            // luma along x, never 0
            val v = 32 + x * 218 / (w - 1)
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        def blackCell(row: Int, colIdx: Int): Unit = {
          var yy = row * 4
          while (yy < (row + 1) * 4) {
            var xx = colIdx * 4
            while (xx < (colIdx + 1) * 4) { img.setRGB(xx, yy, 0); xx += 1 }
            yy += 1
          }
        }
        blackCell(k, 4)
        if (extraRow >= 0) blackCell(extraRow, 6)
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        Row(id, "image", bos.toByteArray,
          Row(Integer.valueOf(w), Integer.valueOf(h), null, "png"))
    }, BinaryColumns.mediaSchema)
  }
}
