package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

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
    * used by the hash entries that treat media as fully opaque).
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      col("text").cast("binary").as("payload"),
      concat(lit("media/"), col("source")).as("media_type"))

  // ======== fixture: deterministic multi-frame PPM "video" ========

  /** Frames per document — deterministic 2..5. */
  def videoFrameCount(docId: Long): Int = 2 + (docId % 4).toInt

  /** Raster byte i of frame f — the per-frame generator both engines
    * replay: (id·31 + f·17 + i·7) mod 256.
    */
  def framePixelByte(docId: Long, frame: Int, i: Long): Int =
    ((docId * 31L + frame * 17L + i * 7L) % 256L).toInt

  /** A video-like payload: `videoFrameCount(id)` concatenated P6
    * rasters sharing the document's (w, h) geometry — the binary shape
    * of an uncompressed frame stream, each frame carrying its own
    * header (as in y4m/MJPEG-style streams). Frame boundaries are NOT
    * stored anywhere; the consumer must genuinely parse them.
    */
  def videoBytes(docId: Long): Array[Byte] = {
    val w = imageWidth(docId); val h = imageHeight(docId)
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val n = 3 * w * h
    val frames = videoFrameCount(docId)
    val out = new Array[Byte](frames * (header.length + n))
    var f = 0
    while (f < frames) {
      val base = f * (header.length + n)
      System.arraycopy(header, 0, out, base, header.length)
      var i = 0
      while (i < n) {
        out(base + header.length + i) = framePixelByte(docId, f, i).toByte
        i += 1
      }
      f += 1
    }
    out
  }

  /** One multi-frame video payload per document row (narrow, no
    * shuffle) — the corpus the m2 frame-sampling entry decodes.
    */
  def withVideoPayload(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(it => it.map(id =>
        (id, "video/x-ppm-stream", videoBytes(id))))
      .toDF("doc_id", "media_type", "payload")
  }

  // ======== fixture: deterministic 8-bit PCM "audio" ========

  /** Samples per clip — deterministic 64..95. */
  def audioSampleCount(docId: Long): Int = 64 + (docId % 32).toInt

  /** 8-bit unsigned PCM sample i — the generator both engines replay:
    * (id·13 + i·11) mod 256.
    */
  def audioSampleByte(docId: Long, i: Long): Int =
    ((docId * 13L + i * 11L) % 256L).toInt

  /** An audio-like payload in a PPM-style container: magic `A1`, ASCII
    * sample-count and sample-rate tokens, one whitespace byte, then the
    * raw 8-bit PCM. The header must genuinely be parsed — sample count
    * is not derivable from the byte length alone once other metadata
    * grows.
    */
  def audioBytes(docId: Long): Array[Byte] = {
    val n = audioSampleCount(docId)
    val header = s"A1\n$n 8000\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + n)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < n) { out(header.length + i) = audioSampleByte(docId, i).toByte; i += 1 }
    out
  }

  /** One audio payload per document row (narrow, no shuffle). */
  def withAudioPayload(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(it => it.map(id =>
        (id, "audio/x-pcm8", audioBytes(id))))
      .toDF("doc_id", "media_type", "payload")
  }

  /** A decoded clip: 8-bit unsigned samples + rate. */
  final case class PcmClip(rate: Int, samples: Array[Byte])

  /** Parse an `A1` audio payload: magic, sample count, rate, ONE
    * whitespace byte, raw samples. Throws on malformed input — decode
    * failures surface, they don't fabricate features.
    */
  def parseAudio(bytes: Array[Byte]): PcmClip = {
    var pos = 0
    def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\r' || b == '\t'
    def token(): String = {
      while (pos < bytes.length && isWs(bytes(pos))) pos += 1
      val start = pos
      while (pos < bytes.length && !isWs(bytes(pos))) pos += 1
      new String(bytes, start, pos - start, "US-ASCII")
    }
    require(token() == "A1", "not an A1 audio payload")
    val n = token().toInt
    val rate = token().toInt
    // the contract demands ONE whitespace byte before the raster; a
    // missing separator would silently shift every sample one byte and
    // fabricate plausible-but-wrong features (review r10)
    require(pos < bytes.length && isWs(bytes(pos)),
      "malformed A1 header: no whitespace before the raster")
    pos += 1
    require(pos + n <= bytes.length, s"truncated audio: need $n samples")
    val samples = new Array[Byte](n)
    System.arraycopy(bytes, pos, samples, 0, n)
    PcmClip(rate, samples)
  }

  /** Windowed energy features — the audio-modality analogue of m3's
    * image features: per 16-sample window, the sample-square sum
    * (integer-exact) and its RMS. The mean-square division (/window
    * length) is exact for the full 16-sample windows and a single IEEE
    * division for the ragged tail; sqrt is correctly rounded per
    * IEEE 754 in every engine, so the m7 oracle hash-matches the
    * whole composition.
    */
  def audioFeatures(spark: SparkSession, media: DataFrame,
      window: Int = 16): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.flatMap { case (id, bytes) =>
        val clip = parseAudio(bytes)
        clip.samples.grouped(window).zipWithIndex.map { case (w, wi) =>
          var ss = 0L
          w.foreach { b => val v = (b & 0xFF).toLong; ss += v * v }
          (id, wi, w.length, ss, math.sqrt(ss.toDouble / w.length))
        }
      })
      .toDF("doc_id", "win_idx", "win_len", "sum_sq", "rms")
  }

  // ======== real decoder ========

  /** A decoded raster image: `pixels` is w·h·3 raw RGB bytes. */
  final case class PpmImage(width: Int, height: Int, maxval: Int, pixels: Array[Byte])

  /** Parse one binary P6 PPM starting at `offset`: magic token,
    * whitespace-separated width / height / maxval, ONE whitespace byte,
    * then the raw raster. Returns the image and the offset of the first
    * byte AFTER its raster — the next frame in a concatenated stream.
    * Throws on malformed input (wrong magic, truncated raster) — a
    * decode failure must surface, not fabricate metadata.
    */
  def parsePpmAt(bytes: Array[Byte], offset: Int): (PpmImage, Int) = {
    var pos = offset
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
    (PpmImage(w, h, maxval, java.util.Arrays.copyOfRange(bytes, pos, pos + n)),
      pos + n)
  }

  /** Parse a single-image P6 payload (trailing bytes ignored). */
  def parsePpm(bytes: Array[Byte]): PpmImage = parsePpmAt(bytes, 0)._1

  /** Decode EVERY frame of a concatenated-P6 stream, in order — frame
    * boundaries come from each frame's own parsed header + raster
    * length, never from out-of-band metadata.
    */
  def parsePpmStream(bytes: Array[Byte]): Seq[PpmImage] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[PpmImage]
    var pos = 0
    while (pos < bytes.length) {
      val (img, next) = parsePpmAt(bytes, pos)
      out += img
      pos = next
    }
    out.toSeq
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

  /** 64-bit average-hash (aHash) of a decoded image — the perceptual
    * fingerprint for IMAGE near-dup dedup: nearest-resample to 8×8
    * (`resizeNearest`), per-pixel gray = r+g+b (integer, no /3
    * rounding), bit p set iff gray(p)·64 > Σgray (strict integer
    * cross-multiplication — no division anywhere, so the hash is
    * engine-exact and the m5 oracle replays it in SQL). Two images with
    * small pixel-level differences land within a few Hamming bits, so
    * the SAME banded pair search that serves SimHash text dedup
    * (`DedupOps.simHashNearPairs`) finds near-dup images — no new join
    * machinery (MultimodalSpec plants a perturbed copy and finds it).
    */
  def aHash64(img: PpmImage): Long = {
    val small = resizeNearest(img, 8, 8)
    val gray = new Array[Int](64)
    var s = 0L
    var p = 0
    while (p < 64) {
      val g = (small(3 * p) & 0xFF) + (small(3 * p + 1) & 0xFF) +
        (small(3 * p + 2) & 0xFF)
      gray(p) = g; s += g; p += 1
    }
    var h = 0L; p = 0
    while (p < 64) { if (gray(p).toLong * 64L > s) h |= (1L << p); p += 1 }
    h
  }

  /** Per-image aHash over a binary media column — one per-partition
    * decode pass, (doc_id, image_hash).
    */
  def imageHashes(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, bytes) =>
        (id, aHash64(parsePpm(bytes)))
      })
      .toDF("doc_id", "image_hash")
  }

  /** Per-frame aHash over a multi-frame video payload — the video
    * modality's dedup fingerprint: one decode pass parses every frame
    * (`parsePpmStream`, boundaries genuinely discovered) and emits
    * (doc_id, frame_idx, frame_hash). Same integer-exact hash as
    * `aHash64`, so the m6 oracle replays it from the frame formula.
    */
  def frameHashes(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.flatMap { case (id, bytes) =>
        parsePpmStream(bytes).zipWithIndex.map { case (img, f) =>
          (id, f, aHash64(img))
        }
      })
      .toDF("doc_id", "frame_idx", "frame_hash")
  }

  /** Video near-dup pairs: two videos sharing at least `minSharedFrames`
    * per-frame hashes — the d2 inverted-index shape on frame hashes
    * (join on the hash, count per pair, threshold), never all-pairs. A
    * re-encoded or re-cut copy keeps most frame hashes; counting shared
    * DISTINCT hashes makes the detector robust to frame reordering and
    * duplicated frames (MultimodalSpec plants a one-frame-perturbed
    * copy and a disjoint video).
    */
  def videoNearDups(spark: SparkSession, media: DataFrame,
      minSharedFrames: Long = 2L): DataFrame = {
    val fh = frameHashes(spark, media)
      .select(col("doc_id"), col("frame_hash")).distinct()
    fh.as("a")
      .join(fh.as("b"),
        col("a.frame_hash") === col("b.frame_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("shared_frames"))
      .filter(col("shared_frames") >= minSharedFrames)
  }

  // ======== compressed codecs via javax.imageio (public JDK) ========

  // Skip ImageIO's disk-backed stream cache: payloads are in-memory byte
  // arrays, and temp-file churn per decode would dominate at scale.
  ImageIO.setUseCache(false)

  /** PNG payload for `docId`: the SAME deterministic raster as the PPM
    * fixture (`pixelByte` over `imageWidth`×`imageHeight`), encoded with
    * the JDK's `javax.imageio` PNG writer. PNG is lossless, so the
    * m9 oracle replays the raster formula exactly — while the Spark side
    * genuinely exercises a real compressed-codec decode (`ImageIO.read`
    * → inflate → de-filter), not the hand-rolled PPM parser.
    */
  def pngBytes(docId: Long): Array[Byte] = {
    val w = imageWidth(docId); val h = imageHeight(docId)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var p = 0
    while (p < w * h) {
      val r = pixelByte(docId, 3L * p)
      val g = pixelByte(docId, 3L * p + 1)
      val b = pixelByte(docId, 3L * p + 2)
      img.setRGB(p % w, p / w, (r << 16) | (g << 8) | b)
      p += 1
    }
    val baos = new ByteArrayOutputStream()
    val writer = writerSpi("png").createWriterInstance()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
    try { writer.setOutput(ios); writer.write(img) }
    finally { writer.dispose(); ios.close() }
    baos.toByteArray
  }

  /** One PNG payload per document row (narrow, no shuffle). */
  def withPngPayload(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(it => it.map(id => (id, "image/png", pngBytes(id))))
      .toDF("doc_id", "media_type", "payload")
  }

  /** Decode any ImageIO-supported payload (PNG, JPEG, GIF, BMP — the
    * JDK's standard plugin set) into the `PpmImage` raster shape the
    * rest of the family consumes (resize, aHash, features). Bulk
    * `getRGB` avoids per-pixel accessor overhead; throws on undecodable
    * bytes — decode failures surface, they don't fabricate rasters.
    */
  def decodeViaImageIO(bytes: Array[Byte]): PpmImage = {
    val img = readImage(bytes)
    val w = img.getWidth; val h = img.getHeight
    val rgb = img.getRGB(0, 0, w, h, null, 0, w)
    val out = new Array[Byte](3 * w * h)
    var p = 0
    while (p < w * h) {
      val v = rgb(p)
      out(3 * p) = ((v >> 16) & 0xFF).toByte
      out(3 * p + 1) = ((v >> 8) & 0xFF).toByte
      out(3 * p + 2) = (v & 0xFF).toByte
      p += 1
    }
    PpmImage(w, h, 255, out)
  }

  /** ImageIO decode pass over a lossless-codec media column: geometry +
    * exact per-channel means + the aHash fingerprint, one per-partition
    * decode (the m9 face). Because the codec is lossless the decoded
    * raster equals the generator formula byte-for-byte, so the oracle
    * replays means AND hash exactly — full m3+m5-strength verification
    * of a real `javax.imageio` decode path.
    */
  def decodeImageIoFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, mt, bytes) =>
          val img = decodeViaImageIO(bytes)
          val npx = img.width * img.height
          var sr = 0L; var sg = 0L; var sb = 0L
          var p = 0
          while (p < npx) {
            sr += img.pixels(3 * p) & 0xFF
            sg += img.pixels(3 * p + 1) & 0xFF
            sb += img.pixels(3 * p + 2) & 0xFF
            p += 1
          }
          (id, mt, img.width, img.height,
            sr.toDouble / npx, sg.toDouble / npx, sb.toDouble / npx,
            aHash64(img))
        }
      }
      .toDF("doc_id", "media_type", "width", "height",
        "mean_r", "mean_g", "mean_b", "image_hash")
  }

  /** JPEG fixture gray level of 8×8 block (bx, by) — r=g=b, so chroma
    * subsampling is a no-op on the fixture.
    */
  def jpegBlockGray(docId: Long, bx: Int, by: Int): Int =
    ((docId * 37L + bx * 17L + by * 29L) % 256L).toInt

  /** JPEG fixture geometry: fixed 64×64. */
  val JpegSide = 64

  /** The pristine (pre-encode) JPEG fixture raster: 64×64, constant-gray
    * 8×8 blocks (`jpegBlockGray`). Constant blocks are pure-DC in the
    * JPEG DCT, so at high quality they decode with ≤~2-level error —
    * the fixture shape that makes a lossy codec testable: exact pixel
    * replay is impossible, but perceptual invariants are rock-solid.
    */
  def jpegRaster(docId: Long): PpmImage = {
    val s = JpegSide
    val out = new Array[Byte](3 * s * s)
    var y = 0
    while (y < s) {
      var x = 0
      while (x < s) {
        val g = jpegBlockGray(docId, x / 8, y / 8).toByte
        val base = 3 * (y * s + x)
        out(base) = g; out(base + 1) = g; out(base + 2) = g
        x += 1
      }
      y += 1
    }
    PpmImage(s, s, 255, out)
  }

  /** Encode a raster as JPEG at an explicit quality via the JDK writer
    * (deterministic for a fixed JDK: no timestamps or randomness in the
    * JFIF stream).
    */
  def encodeJpeg(img: PpmImage, quality: Float = 0.9f): Array[Byte] = {
    val buf = new BufferedImage(img.width, img.height, BufferedImage.TYPE_INT_RGB)
    var p = 0
    while (p < img.width * img.height) {
      val r = img.pixels(3 * p) & 0xFF
      val g = img.pixels(3 * p + 1) & 0xFF
      val b = img.pixels(3 * p + 2) & 0xFF
      buf.setRGB(p % img.width, p / img.width, (r << 16) | (g << 8) | b)
      p += 1
    }
    val writer = writerSpi("jpeg").createWriterInstance()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val baos = new ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
    try {
      writer.setOutput(ios)
      writer.write(null, new IIOImage(buf, null, null), param)
    } finally { writer.dispose(); ios.close() }
    baos.toByteArray
  }

  /** One JPEG payload per document row (narrow, no shuffle). */
  def withJpegPayload(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(it => it.map(id =>
        (id, "image/jpeg", encodeJpeg(jpegRaster(id)))))
      .toDF("doc_id", "media_type", "payload")
  }

  /** The m8 face: decode each JPEG with `ImageIO.read` and report
    * geometry plus perceptual invariants against the pristine fixture
    * raster — aHash Hamming distance ≤ 6 bits and every channel mean
    * within 2 gray levels. JPEG is lossy, so an exact-pixel oracle is
    * impossible BY THE CODEC'S NATURE; geometry + these invariants are
    * the strongest engine-independent claims it permits (documented in
    * m8's oracle comment). Any real decode defect — wrong geometry,
    * channel slip, raster corruption, codec failure — flips an invariant
    * to 0 and breaks the oracle hash.
    */
  def decodeJpegInvariants(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, mt, bytes) =>
          val dec = decodeViaImageIO(bytes)
          val src = jpegRaster(id)
          val hamming =
            java.lang.Long.bitCount(aHash64(dec) ^ aHash64(src))
          val n = dec.width * dec.height
          var dr = 0L; var dg = 0L; var db = 0L
          var sr = 0L; var sg = 0L; var sb = 0L
          var p = 0
          while (p < math.min(n, src.width * src.height)) {
            dr += dec.pixels(3 * p) & 0xFF; sr += src.pixels(3 * p) & 0xFF
            dg += dec.pixels(3 * p + 1) & 0xFF; sg += src.pixels(3 * p + 1) & 0xFF
            db += dec.pixels(3 * p + 2) & 0xFF; sb += src.pixels(3 * p + 2) & 0xFF
            p += 1
          }
          val meanDiff = Seq((dr, sr), (dg, sg), (db, sb)).map {
            case (d, s) => math.abs(d - s).toDouble / n
          }.max
          (id, mt, dec.width, dec.height,
            if (hamming <= 6) 1 else 0,
            if (meanDiff <= 2.0) 1 else 0)
        }
      }
      .toDF("doc_id", "media_type", "width", "height",
        "hash_near", "means_close")
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

  /** Frame sampling over DECODED video: walk every frame boundary of
    * the concatenated-P6 stream with the real parser, keep every
    * `step`-th frame, and emit its geometry plus order-sensitive byte
    * stats (Σv and the position-weighted Σ v·(i+1)) — a frame-boundary
    * mis-parse, channel slip, or off-by-one frame index cannot
    * hash-match the oracle's replay of the generator formula. Decode
    * runs per-partition over the binary column: frames never shuffle,
    * memory is bounded by one payload at a time.
    */
  def frameSample(spark: SparkSession, media: DataFrame, step: Int): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          parsePpmStream(bytes).iterator.zipWithIndex
            .filter { case (_, f) => f % step == 0 }
            .map { case (img, f) =>
              var s = 0L; var c = 0L; var i = 0
              while (i < img.pixels.length) {
                val v = (img.pixels(i) & 0xFF).toLong
                s += v; c += v * (i + 1); i += 1
              }
              (id, f, img.width, img.height, s, c)
            }
        }
      }
      .toDF("doc_id", "frame_idx", "width", "height", "byte_sum", "byte_checksum")
  }

  // ======== real audio codec via javax.sound.sampled (public JDK) ========

  /** Per-doc 16-bit PCM fixture: sample count and signed sample value.
    * Same determinism contract as `audioSampleByte` but full 16-bit
    * range slice, so the RIFF/WAVE little-endian frame reassembly is
    * genuinely exercised (sign bit + both bytes carry information).
    */
  def wavSampleCount(docId: Long): Int = 64 + (docId % 32).toInt
  def wavSample(docId: Long, i: Long): Int =
    (((docId * 13 + i * 11) % 4096) - 2048).toInt

  val WavRate = 8000f

  /** Audio SPI providers cached ONCE PER JVM: every
    * `AudioSystem.getAudioInputStream` / `AudioSystem.write` call
    * re-enumerates the provider set with a fresh `ServiceLoader`
    * (`JDK13Services` builds one per lookup), so the per-clip decode
    * paid a provider scan per payload — measured as roughly half the
    * m10/m12 entry cost. The public `javax.sound.sampled.spi` SPI
    * exposes the same provider set, so it is loaded once per executor
    * JVM (lazy vals on this object) and dispatched directly; the SAME
    * provider parses/writes each payload, so results are
    * byte-identical (MultimodalSpec + the m10/m12 oracle hashes pin
    * that).
    */
  /** ImageIO provider SPIs cached ONCE PER JVM — the image twin of the
    * audio caching below. `ImageIO.read`/`write` and the by-format
    * lookups consult the IIORegistry per call (an in-memory filter —
    * cheaper than audio's fresh ServiceLoader, but still a per-payload
    * iterator + canDecodeInput probe chain), and
    * `createImageInput/OutputStream` scan the stream-SPI category per
    * call. The registry is JVM-global and these SPI instances are the
    * exact objects ImageIO itself dispatches to, so decode/encode
    * bytes are identical (the m8/m9/m11 oracle hashes pin it).
    * Reader/writer INSTANCES stay per-call — they are stateful
    * (`setInput`/`setOutput`) and not thread-safe; the SPIs are the
    * factories the platform already shares across threads. Streams are
    * built directly as MemoryCacheImage*Stream (the registry default
    * with `setUseCache(false)`, set above), skipping the stream-SPI
    * scan entirely.
    */
  private lazy val imageReaderSpis: Seq[javax.imageio.spi.ImageReaderSpi] = {
    import scala.jdk.CollectionConverters._
    javax.imageio.spi.IIORegistry.getDefaultInstance
      .getServiceProviders(classOf[javax.imageio.spi.ImageReaderSpi], true)
      .asScala.toSeq
  }

  private val imageReaderSpiByFormat = new java.util.concurrent.ConcurrentHashMap[
    String, javax.imageio.spi.ImageReaderSpi]()

  private def readerSpi(format: String): javax.imageio.spi.ImageReaderSpi =
    imageReaderSpiByFormat.computeIfAbsent(format, { f =>
      imageReaderSpis
        .find(_.getFormatNames.exists(_.equalsIgnoreCase(f)))
        .getOrElse(throw new IllegalStateException(s"no $f reader installed"))
    })

  private val imageWriterSpiByFormat = new java.util.concurrent.ConcurrentHashMap[
    String, javax.imageio.spi.ImageWriterSpi]()

  private def writerSpi(format: String): javax.imageio.spi.ImageWriterSpi =
    imageWriterSpiByFormat.computeIfAbsent(format, { f =>
      import scala.jdk.CollectionConverters._
      javax.imageio.spi.IIORegistry.getDefaultInstance
        .getServiceProviders(classOf[javax.imageio.spi.ImageWriterSpi], true)
        .asScala
        .find(_.getFormatNames.exists(_.equalsIgnoreCase(f)))
        .getOrElse(throw new IllegalStateException(s"no $f writer installed"))
    })

  /** Last reader SPI that accepted a payload, probed first on the next
    * (the audio `lastGoodReader` hint at the image tier — decode
    * streams are format-uniform, so it hits ~always; `canDecodeInput`
    * is a boolean probe that leaves the stream position unchanged, so
    * a miss just falls through to the full cached list).
    */
  @volatile private var lastGoodImageSpi: javax.imageio.spi.ImageReaderSpi = null

  /** `ImageIO.read` minus the per-call registry scans: direct
    * MemoryCacheImageInputStream, cached reader SPIs, hint-first
    * format sniffing, fresh (stateful) reader instance per payload.
    */
  private def readImage(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new ByteArrayInputStream(bytes))
    // the whole sniff+read sits inside one try/finally so the stream's
    // cache buffers are released even on the no-SPI throw (the encode
    // paths already close their output streams the same way)
    try {
      // a sniff that dies on a truncated/garbage payload (EOFException
      // from a short magic read) means "not my format" — the same
      // IOException-swallowing contract ImageIO.getImageReaders applies
      def sniffs(s: javax.imageio.spi.ImageReaderSpi): Boolean =
        try s.canDecodeInput(iis) catch { case _: java.io.IOException => false }
      val hint = lastGoodImageSpi
      val spi =
        if (hint != null && sniffs(hint)) hint
        else imageReaderSpis.find(sniffs) match {
          case Some(s) => lastGoodImageSpi = s; s
          case None =>
            throw new IllegalArgumentException(
              "requirement failed: ImageIO could not decode payload")
        }
      val reader = spi.createReaderInstance()
      try { reader.setInput(iis, true, true); reader.read(0) }
      finally reader.dispose()
    } finally iis.close()
  }

  private lazy val audioReaders: Seq[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .iterator.asScala.toSeq
  }

  private lazy val audioWriters: Seq[javax.sound.sampled.spi.AudioFileWriter] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .iterator.asScala.toSeq
  }

  /** Last reader that accepted a payload, tried first on the next one:
    * a rejecting reader signals by THROWING UnsupportedAudioFileException,
    * and per-clip exception construction ahead of the accepting reader
    * was measured at ~4× the whole decode (m10's WAV sat behind the
    * AIFF reader in provider order). Decode streams are format-uniform,
    * so the hint hits ~always; a mixed stream just pays the old probe
    * order on format flips. Correctness is unchanged: providers are
    * format-disjoint, so WHICH reader accepts is a function of the
    * payload, not of probe order.
    */
  @volatile private var lastGoodReader: javax.sound.sampled.spi.AudioFileReader = null

  /** `AudioSystem.getAudioInputStream` minus the per-call provider
    * scan: first cached reader that accepts the payload wins (the
    * AudioSystem contract — providers are format-disjoint here).
    */
  private def openAudio(bytes: Array[Byte]): javax.sound.sampled.AudioInputStream = {
    val hint = lastGoodReader
    if (hint != null) {
      try return hint.getAudioInputStream(new ByteArrayInputStream(bytes))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => ()
      }
    }
    audioReaders.iterator.flatMap { r =>
      try {
        val ais = r.getAudioInputStream(new ByteArrayInputStream(bytes))
        lastGoodReader = r
        Some(ais)
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => None
      }
    }.nextOption().getOrElse(throw
      new javax.sound.sampled.UnsupportedAudioFileException(
        "no installed audio provider accepts the payload"))
  }

  /** `AudioSystem.write` minus the per-call provider scan. */
  private def writeAudio(ais: javax.sound.sampled.AudioInputStream,
      tpe: javax.sound.sampled.AudioFileFormat.Type,
      out: java.io.OutputStream): Unit = {
    val w = audioWriters.find(_.isFileTypeSupported(tpe, ais))
      .getOrElse(throw new IllegalArgumentException(
        s"no installed audio provider writes $tpe"))
    w.write(ais, tpe, out)
    ()
  }

  /** A real RIFF/WAVE payload written by the JDK's own WAV encoder
    * (`javax.sound.sampled.AudioSystem.write`): 16-bit signed
    * little-endian mono PCM at 8 kHz. WAV PCM is lossless, so the m10
    * oracle replays the full sample formula — a header mis-parse,
    * endianness slip, or frame-size error cannot hash-match.
    */
  def wavBytes(docId: Long): Array[Byte] = {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioFileFormat}
    val n = wavSampleCount(docId)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = wavSample(docId, i)
      pcm(2 * i) = (v & 0xFF).toByte          // little-endian low byte
      pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new AudioFormat(WavRate, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, n.toLong)
    val baos = new ByteArrayOutputStream()
    writeAudio(ais, AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** One WAV payload per document row (narrow, no shuffle). */
  def withWavPayload(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(it => it.map(id => (id, "audio/wav", wavBytes(id))))
      .toDF("doc_id", "media_type", "payload")
  }

  /** A decoded PCM clip with full format metadata. */
  final case class WavClip(rate: Float, bits: Int, channels: Int, samples: Array[Int])

  /** Decode a RIFF/WAVE payload with the JDK's real WAV reader
    * (`AudioSystem.getAudioInputStream`): container parse, format
    * negotiation, then little-endian signed 16-bit frame reassembly.
    * Throws on anything but 16-bit mono PCM — a decode failure must
    * surface, not fabricate samples.
    */
  def decodeWav(bytes: Array[Byte]): WavClip = {
    val ais = openAudio(bytes)
    try {
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
        !fmt.isBigEndian, s"unsupported WAV format: $fmt")
      val raw = ais.readAllBytes()
      val n = raw.length / 2
      val out = new Array[Int](n)
      var i = 0
      while (i < n) {
        out(i) = ((raw(2 * i + 1).toInt << 8) | (raw(2 * i) & 0xFF))
        i += 1
      }
      WavClip(fmt.getSampleRate, fmt.getSampleSizeInBits, fmt.getChannels, out)
    } finally ais.close()
  }

  /** The m10 face: decode each WAV with the JDK codec and emit m7-shape
    * windowed features over the SIGNED samples (sum of squares is
    * integer-exact; rms is one IEEE division + a correctly-rounded
    * sqrt, so the whole composition hash-matches the oracle replay).
    * Per-partition decode, no shuffle; `sample_rate` pins the parsed
    * header, `n_samples` the frame count.
    */
  def wavFeatures(spark: SparkSession, media: DataFrame,
      window: Int = 16): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.flatMap { case (id, bytes) =>
        val clip = decodeWav(bytes)
        clip.samples.grouped(window).zipWithIndex.map { case (w, wi) =>
          var ss = 0L
          w.foreach { v => ss += v.toLong * v }
          (id, clip.rate.toInt, clip.samples.length, wi, w.length, ss,
            math.sqrt(ss.toDouble / w.length))
        }
      })
      .toDF("doc_id", "sample_rate", "n_samples", "win_idx", "win_len",
        "sum_sq", "rms")
  }

  // ======== fixture: real animated GIF via javax.imageio ========

  /** Gray level of pixel p in frame f of the GIF fixture. r = g = b,
    * so a 256-entry gray palette holds every color the raster can use
    * and GIF's palette-indexed LZW encoding is LOSSLESS on it — the
    * property that lets the m11 oracle replay the decode exactly
    * (the m9 contract, extended to a real multi-frame container).
    */
  def gifFramePixel(docId: Long, frame: Int, p: Long): Int =
    ((docId * 31L + frame * 17L + p * 7L) % 256L).toInt

  // one shared identity-gray palette: index i -> (i, i, i)
  private lazy val grayPalette: java.awt.image.IndexColorModel = {
    val g = Array.tabulate(256)(_.toByte)
    new java.awt.image.IndexColorModel(8, 256, g, g, g)
  }

  /** An ANIMATED GIF payload written by the JDK's own GIF writer
    * (`javax.imageio` sequence API): `videoFrameCount(id)` full-size
    * frames of the gray fixture raster, sharing the document's (w, h)
    * geometry. A real multi-frame container — frame boundaries live in
    * GIF image descriptors the reader must genuinely parse, unlike the
    * synthetic concatenated-P6 stream of m2/m6.
    */
  def gifBytes(docId: Long): Array[Byte] = {
    val w = imageWidth(docId); val h = imageHeight(docId)
    encodeGifGray((0 until videoFrameCount(docId)).map { f =>
      val px = new Array[Byte](3 * w * h)
      var p = 0
      while (p < w * h) {
        val v = gifFramePixel(docId, f, p).toByte
        px(3 * p) = v; px(3 * p + 1) = v; px(3 * p + 2) = v
        p += 1
      }
      PpmImage(w, h, 255, px)
    })
  }

  /** Encode gray rasters (r = g = b; the red channel is the palette
    * index) as one animated GIF via the JDK sequence writer. Public so
    * MultimodalSpec can plant re-cut copies frame-for-frame.
    */
  def encodeGifGray(frames: Seq[PpmImage]): Array[Byte] = {
    val writer = writerSpi("gif").createWriterInstance()
    val baos = new ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { fr =>
        val img = new BufferedImage(fr.width, fr.height,
          BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
        val raster = img.getRaster
        var p = 0
        while (p < fr.width * fr.height) {
          raster.setSample(p % fr.width, p / fr.width, 0,
            fr.pixels(3 * p) & 0xFF)
          p += 1
        }
        writer.writeToSequence(new IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    baos.toByteArray
  }

  /** One animated-GIF payload per document row (narrow, no shuffle). */
  def withGifPayload(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(it => it.map(id => (id, "image/gif", gifBytes(id))))
      .toDF("doc_id", "media_type", "payload")
  }

  /** Decode every frame of a GIF payload with the JDK reader — real
    * container parse (logical screen descriptor, per-frame image
    * descriptors, LZW) into the `PpmImage` shape the whole image
    * family consumes. Frames are written full-size by `gifBytes`, so
    * no disposal compositing is involved; throws on undecodable bytes.
    */
  def decodeGifFrames(bytes: Array[Byte]): Seq[PpmImage] = {
    val reader = readerSpi("gif").createReaderInstance()
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis, false, true)
      val n = reader.getNumImages(true)
      (0 until n).map { i =>
        val img = reader.read(i)
        val w = img.getWidth; val h = img.getHeight
        val rgb = img.getRGB(0, 0, w, h, null, 0, w)
        val out = new Array[Byte](3 * w * h)
        var p = 0
        while (p < w * h) {
          val v = rgb(p)
          out(3 * p) = ((v >> 16) & 0xFF).toByte
          out(3 * p + 1) = ((v >> 8) & 0xFF).toByte
          out(3 * p + 2) = (v & 0xFF).toByte
          p += 1
        }
        PpmImage(w, h, 255, out)
      }
    } finally { reader.dispose(); iis.close() }
  }

  /** The m11 face: per-frame geometry, exact gray mean, and the aHash
    * fingerprint over a real GIF decode. Lossless palette round-trip →
    * the oracle replays every column from the pixel formula; the
    * hashes feed the UNCHANGED m6 near-dup band machinery
    * (`gifNearDups`, MultimodalSpec's planted re-cut).
    */
  def gifFrameFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.flatMap { case (id, bytes) =>
        decodeGifFrames(bytes).zipWithIndex.map { case (img, f) =>
          val npx = img.width * img.height
          var sv = 0L
          var p = 0
          while (p < npx) { sv += img.pixels(3 * p) & 0xFF; p += 1 }
          (id, f, img.width, img.height, sv.toDouble / npx, aHash64(img))
        }
      })
      .toDF("doc_id", "frame_idx", "width", "height", "mean_v",
        "frame_hash")
  }

  /** GIF near-dup pairs: `videoNearDups`' inverted-index shape over
    * the GIF frame hashes — shared-distinct-hash count per pair,
    * never all-pairs.
    */
  def gifNearDups(spark: SparkSession, media: DataFrame,
      minSharedFrames: Long = 2L): DataFrame = {
    val fh = gifFrameFeatures(spark, media)
      .select(col("doc_id"), col("frame_hash")).distinct()
    fh.as("a")
      .join(fh.as("b"),
        col("a.frame_hash") === col("b.frame_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("shared_frames"))
      .filter(col("shared_frames") >= minSharedFrames)
  }

  // ======== fixture: real big-endian AIFF via javax.sound ========

  /** AIFF sample formula — same signed 16-bit slice shape as the WAV
    * fixture but a DIFFERENT multiplier pair, and crucially values
    * whose two bytes differ, so a byte-swap (endianness slip) can
    * never reproduce the formula.
    */
  def aiffSampleCount(docId: Long): Int = 64 + (docId % 32).toInt
  def aiffSample(docId: Long, i: Long): Int =
    (((docId * 19 + i * 23) % 4096) - 2048).toInt

  /** A real AIFF payload written by the JDK's own encoder
    * (`javax.sound.sampled.AudioSystem.write`, Type.AIFF): 16-bit
    * signed BIG-endian mono PCM at 8 kHz — the endianness-sensitive
    * twin of the m10 WAV round trip (AIFF stores PCM big-endian where
    * RIFF/WAVE stores it little-endian; the container dictates the
    * byte order, the decoder must honor it).
    */
  def aiffBytes(docId: Long): Array[Byte] = {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioFileFormat}
    val n = aiffSampleCount(docId)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = aiffSample(docId, i)
      pcm(2 * i) = ((v >> 8) & 0xFF).toByte   // big-endian high byte
      pcm(2 * i + 1) = (v & 0xFF).toByte
      i += 1
    }
    val fmt = new AudioFormat(WavRate, 16, 1, true, true)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, n.toLong)
    val baos = new ByteArrayOutputStream()
    writeAudio(ais, AudioFileFormat.Type.AIFF, baos)
    baos.toByteArray
  }

  /** One AIFF payload per document row (narrow, no shuffle). */
  def withAiffPayload(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(it => it.map(id => (id, "audio/aiff", aiffBytes(id))))
      .toDF("doc_id", "media_type", "payload")
  }

  /** Decode an AIFF payload with the JDK reader: container parse
    * (FORM/COMM/SSND chunks), then BIG-endian signed 16-bit frame
    * reassembly. Requires big-endian 16-bit mono — the inverse
    * endianness contract of `decodeWav`; a little-endian reassembly
    * here would produce byte-swapped samples and fail the oracle hash
    * (MultimodalSpec pins the negative case).
    */
  def decodeAiff(bytes: Array[Byte]): WavClip = {
    val ais = openAudio(bytes)
    try {
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
        fmt.isBigEndian, s"unsupported AIFF format: $fmt")
      val raw = ais.readAllBytes()
      val n = raw.length / 2
      val out = new Array[Int](n)
      var i = 0
      while (i < n) {
        out(i) = ((raw(2 * i).toInt << 8) | (raw(2 * i + 1) & 0xFF))
        i += 1
      }
      WavClip(fmt.getSampleRate, fmt.getSampleSizeInBits, fmt.getChannels, out)
    } finally ais.close()
  }

  /** The m12 face: m10's windowed-energy features over the AIFF
    * decode — integer sum of squares, one IEEE division, one
    * correctly-rounded sqrt, fully oracle-replayed from the sample
    * formula.
    */
  def aiffFeatures(spark: SparkSession, media: DataFrame,
      window: Int = 16): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.flatMap { case (id, bytes) =>
        val clip = decodeAiff(bytes)
        clip.samples.grouped(window).zipWithIndex.map { case (w, wi) =>
          var ss = 0L
          w.foreach { v => ss += v.toLong * v }
          (id, clip.rate.toInt, clip.samples.length, wi, w.length, ss,
            math.sqrt(ss.toDouble / w.length))
        }
      })
      .toDF("doc_id", "sample_rate", "n_samples", "win_idx", "win_len",
        "sum_sq", "rms")
  }
}
