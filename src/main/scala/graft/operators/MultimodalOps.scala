package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder brief): image/audio/video payloads
  * travel as opaque `binary` columns with typed metadata; decode /
  * feature-extract / resize / frame-sample run per-partition over the
  * binary column — no shuffle, payloads stay columnar (parquet binary)
  * end to end.
  *
  * The decoder is REAL: a pure-JVM parser for the uncompressed binary
  * PPM raster format (P6: ASCII header `P6\n<w> <h>\n255\n` followed by
  * w·h·3 raw RGB bytes) — no image library needed, plain byte
  * arithmetic. Compressed codecs (JPEG/WAV/MP4) would slot into
  * `parsePpm`'s place unchanged: same signature (bytes in, typed image
  * out), same per-partition iterator shape (one decoder init per
  * partition, buffer reuse per row — the JVM analogue of a pandas-batch
  * UDF).
  *
  * The payload fixture (`ppmBytes`) is a deterministic integer formula,
  * so a SQL oracle can replay the expected decode/feature/resize
  * results without parsing binary — while the Spark side genuinely
  * parses the bytes it synthesized: a header mis-parse, channel
  * interleave bug, or resize index error shows up as a hash mismatch.
  */
object MultimodalOps {

  // ======== fixture: deterministic PPM payloads ========

  /** Image dimensions per document — small and co-prime cycles so the
    * corpus covers many (w, h) shapes.
    */
  def imageWidth(docId: Long): Int = 8 + (docId % 9).toInt
  def imageHeight(docId: Long): Int = 8 + (docId % 7).toInt

  /** Raster byte i (0-based over the RGB area, row-major, channels
    * interleaved) — the formula both engines replay: (id·31 + i·7) mod
    * 256. All-positive integer arithmetic, identical in any engine.
    */
  def pixelByte(docId: Long, i: Long): Int = ((docId * 31L + i * 7L) % 256L).toInt

  /** A complete binary P6 PPM payload for `docId`. */
  def ppmBytes(docId: Long): Array[Byte] = {
    val w = imageWidth(docId); val h = imageHeight(docId)
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val n = 3 * w * h
    val out = new Array[Byte](header.length + n)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < n) { out(header.length + i) = pixelByte(docId, i).toByte; i += 1 }
    out
  }

  /** One PPM payload per document row — the image-corpus fixture the
    * m3/m4 entries decode. Built per-partition (narrow, no shuffle).
    */
  def withImagePayload(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(it => it.map(id =>
        (id, "image/x-portable-pixmap", ppmBytes(id))))
      .toDF("doc_id", "media_type", "payload")
  }

  /** Attach an opaque binary payload + media_type to the documents table
    * (payload = UTF-8 bytes of `text` — deterministic, testdata-derived;
    * used by the hash/frame entries that treat media as fully opaque).
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      col("text").cast("binary").as("payload"),
      concat(lit("media/"), col("source")).as("media_type"))

  // ======== real decoder ========

  /** A decoded raster image: `pixels` is w·h·3 raw RGB bytes. */
  final case class PpmImage(width: Int, height: Int, maxval: Int, pixels: Array[Byte])

  /** Parse a binary P6 PPM: magic token, whitespace-separated width /
    * height / maxval, ONE whitespace byte, then the raw raster. Throws
    * on malformed input (wrong magic, truncated raster) — a decode
    * failure must surface, not fabricate metadata.
    */
  def parsePpm(bytes: Array[Byte]): PpmImage = {
    var pos = 0
    def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\r' || b == '\t'
    def token(): String = {
      while (pos < bytes.length && isWs(bytes(pos))) pos += 1
      val start = pos
      while (pos < bytes.length && !isWs(bytes(pos))) pos += 1
      new String(bytes, start, pos - start, "US-ASCII")
    }
    val magic = token()
    require(magic == "P6", s"not a binary PPM (magic '$magic')")
    val w = token().toInt; val h = token().toInt; val maxval = token().toInt
    require(w > 0 && h > 0 && maxval == 255,
      s"unsupported PPM geometry w=$w h=$h maxval=$maxval")
    pos += 1 // the single whitespace byte that terminates the header
    val n = 3 * w * h
    require(bytes.length >= pos + n,
      s"truncated PPM raster: need ${pos + n} bytes, have ${bytes.length}")
    PpmImage(w, h, maxval, java.util.Arrays.copyOfRange(bytes, pos, pos + n))
  }

  /** Typed decode output: geometry + per-channel mean intensity. Means
    * are exact-integer channel sums divided once in IEEE double —
    * bit-identical in any engine.
    */
  final case class ImageFeatures(
      doc_id: Long, media_type: String, byte_len: Int,
      width: Int, height: Int, maxval: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** Decode pass: mapPartitions over the binary column — per-partition
    * decoder lifecycle, bounded memory (one payload at a time), typed
    * Dataset out for downstream relational ops.
    */
  def decodeImages(spark: SparkSession, media: DataFrame): Dataset[ImageFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // compressed codecs initialize per-partition state here
        // (decoder, scratch buffers); the PPM parser needs none.
        it.map { case (id, mt, bytes) =>
          val img = parsePpm(bytes)
          val npx = img.width * img.height
          var sr = 0L; var sg = 0L; var sb = 0L
          var p = 0
          while (p < npx) {
            sr += img.pixels(3 * p) & 0xFF
            sg += img.pixels(3 * p + 1) & 0xFF
            sb += img.pixels(3 * p + 2) & 0xFF
            p += 1
          }
          ImageFeatures(id, mt, bytes.length, img.width, img.height, img.maxval,
            sr.toDouble / npx, sg.toDouble / npx, sb.toDouble / npx)
        }
      }
  }

  /** Nearest-neighbour resample to `outW`×`outH`: output pixel (x, y)
    * takes source pixel (⌊x·w/outW⌋, ⌊y·h/outH⌋) — real pixel-indexed
    * resizing over the decoded raster, all integer arithmetic.
    */
  def resizeNearest(img: PpmImage, outW: Int, outH: Int): Array[Byte] = {
    val out = new Array[Byte](3 * outW * outH)
    var y = 0
    while (y < outH) {
      val sy = y * img.height / outH
      var x = 0
      while (x < outW) {
        val sx = x * img.width / outW
        val src = 3 * (sy * img.width + sx)
        val dst = 3 * (y * outW + x)
        out(dst) = img.pixels(src)
        out(dst + 1) = img.pixels(src + 1)
        out(dst + 2) = img.pixels(src + 2)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Resize pass: decode + nearest-neighbour resample per partition;
    * output payloads are exactly 3·outW·outH bytes.
    */
  def resizeImages(spark: SparkSession, media: DataFrame,
      outW: Int, outH: Int): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // compressed codecs allocate decode/encode buffers here, once
        it.map { case (id, mt, bytes) =>
          (id, mt, outW, outH, resizeNearest(parsePpm(bytes), outW, outH))
        }
      }
      .toDF("doc_id", "media_type", "out_w", "out_h", "resized")
  }

  /** Order-sensitive byte statistics of a resized payload: plain sum
    * plus a position-weighted checksum (Σ v·(i+1)) — a transposed or
    * channel-swapped resize matches the sum but never the checksum.
    * Computed in the same per-partition pass (bytes never shuffle).
    */
  def resizedStats(spark: SparkSession, resized: DataFrame): DataFrame = {
    import spark.implicits._
    resized.select(col("doc_id"), col("media_type"), col("out_w"), col("out_h"),
        col("resized"))
      .as[(Long, String, Int, Int, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, mt, w, h, bytes) =>
          var s = 0L; var c = 0L; var i = 0
          while (i < bytes.length) {
            val v = (bytes(i) & 0xFF).toLong
            s += v; c += v * (i + 1); i += 1
          }
          (id, mt, w, h, bytes.length, s, c)
        }
      }
      .toDF("doc_id", "media_type", "out_w", "out_h", "out_len",
        "byte_sum", "byte_checksum")
  }

  /** Frame sampling plumbing: every `step`-th frame of the decoded
    * stream, frame payload = a byte slice (stand-in for the decoded
    * frame) — pure expressions, no UDF, order-preserving explode.
    */
  def frameSample(media: DataFrame, step: Int, frameBytes: Int = 8): DataFrame =
    media
      .withColumn("n_frames", lit(1) + octet_length(col("payload")) % 30)
      .select(col("doc_id"), col("payload"),
        explode(expr(s"sequence(0, n_frames - 1, $step)")).as("frame_idx"))
      .filter(octet_length(col("payload")) >= col("frame_idx") * frameBytes + frameBytes)
      .select(col("doc_id"), col("frame_idx"),
        expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)")
          .as("frame_payload"))
}
