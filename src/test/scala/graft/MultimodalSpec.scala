package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MultimodalOps

class MultimodalSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("binaryFile source round-trips opaque payloads (S4-style listing + content)") {
    val dir = Files.createTempDirectory("graft_media").toString
    val payloads = Map(
      "a.bin" -> Array[Byte](1, 2, 3, -1, 0, 127),
      "b.bin" -> "opaque media bytes".getBytes("UTF-8"))
    payloads.foreach { case (name, bytes) =>
      Files.write(java.nio.file.Paths.get(dir, name), bytes)
    }
    val read = spark.read.format("binaryFile").load(dir)
      .select(element_at(split(col("path"), "/"), -1).as("name"),
        col("length"), col("content"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("content")).toMap
    assert(read.keySet === payloads.keySet)
    payloads.foreach { case (n, bytes) => assert(read(n).sameElements(bytes), n) }
  }

  test("parsePpm round-trips the generated payload exactly") {
    for (id <- Seq(0L, 1L, 7L, 63L, 499L)) {
      val img = MultimodalOps.parsePpm(MultimodalOps.ppmBytes(id))
      assert(img.width === MultimodalOps.imageWidth(id))
      assert(img.height === MultimodalOps.imageHeight(id))
      assert(img.maxval === 255)
      assert(img.pixels.length === 3 * img.width * img.height)
      // every raster byte is exactly the generator formula value
      img.pixels.zipWithIndex.foreach { case (b, i) =>
        assert((b & 0xFF) === MultimodalOps.pixelByte(id, i), s"doc $id byte $i")
      }
    }
  }

  test("parsePpm rejects malformed payloads instead of fabricating metadata") {
    intercept[IllegalArgumentException] {
      MultimodalOps.parsePpm("P5\n8 8\n255\nxxxx".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] { // truncated raster
      MultimodalOps.parsePpm("P6\n8 8\n255\nshort".getBytes("US-ASCII"))
    }
  }

  test("decodeImages emits real geometry and hand-computable channel means") {
    val media = MultimodalOps.withImagePayload(
      spark, Tables.load(spark, sf, "documents"))
    val feats = MultimodalOps.decodeImages(spark, media).toDF()
      .orderBy("doc_id").collect()
    assert(feats.length === Tables.load(spark, sf, "documents").count())
    feats.take(20).foreach { r =>
      val id = r.getLong(0)
      val w = MultimodalOps.imageWidth(id); val h = MultimodalOps.imageHeight(id)
      assert(r.getInt(3) === w); assert(r.getInt(4) === h)
      val npx = w * h
      val expectedMeanR =
        (0 until npx).map(p => MultimodalOps.pixelByte(id, 3L * p).toLong)
          .sum.toDouble / npx
      assert(r.getDouble(6) === expectedMeanR, s"mean_r doc $id")
      // means of bytes are within [0, 255]
      Seq(6, 7, 8).foreach(i => assert(r.getDouble(i) >= 0 && r.getDouble(i) <= 255))
    }
  }

  test("frame sampling decodes real frame boundaries and per-frame stats") {
    // parsePpmStream: frame count and every frame byte match the generator
    val imgs = MultimodalOps.parsePpmStream(MultimodalOps.videoBytes(7L))
    assert(imgs.length === MultimodalOps.videoFrameCount(7L))
    imgs.zipWithIndex.foreach { case (img, f) =>
      assert(img.width === MultimodalOps.imageWidth(7L))
      assert(img.height === MultimodalOps.imageHeight(7L))
      img.pixels.zipWithIndex.foreach { case (b, i) =>
        assert((b & 0xFF) === MultimodalOps.framePixelByte(7L, f, i),
          s"frame $f byte $i")
      }
    }

    val media = MultimodalOps.withVideoPayload(
      spark, Tables.load(spark, sf, "documents"))
    val frames = MultimodalOps.frameSample(spark, media, step = 2)
    // every sampled index is a multiple of the step
    assert(frames.filter(col("frame_idx") % 2 =!= 0).count() === 0)
    // exactly ceil(n_frames / step) sampled frames per doc
    val counts = frames.groupBy("doc_id").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    counts.foreach { case (id, n) =>
      assert(n === (MultimodalOps.videoFrameCount(id) + 1) / 2, s"doc $id")
    }
    assert(counts.size === Tables.load(spark, sf, "documents").count())
    // hand-check one non-zero frame's stats against the generator formula
    val r = frames.filter(col("doc_id") === 5L && col("frame_idx") === 2)
      .collect().head
    val w = MultimodalOps.imageWidth(5L); val h = MultimodalOps.imageHeight(5L)
    assert(r.getAs[Int]("width") === w); assert(r.getAs[Int]("height") === h)
    val vs = (0 until 3 * w * h).map(i =>
      MultimodalOps.framePixelByte(5L, 2, i).toLong)
    assert(r.getAs[Long]("byte_sum") === vs.sum)
    assert(r.getAs[Long]("byte_checksum") ===
      vs.zipWithIndex.map { case (v, i) => v * (i + 1) }.sum)
  }

  test("parsePpmStream round-trips arbitrary geometries and frame counts") {
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 50) {
      // multi-digit dims exercise variable-length headers; frame sizes
      // differ WITHIN a stream (each frame parses its own header)
      val frames = (0 until (1 + rnd.nextInt(6))).map { _ =>
        val w = 1 + rnd.nextInt(40); val h = 1 + rnd.nextInt(25)
        val px = Array.fill(3 * w * h)(rnd.nextInt(256).toByte)
        (w, h, px)
      }
      val payload = frames.flatMap { case (w, h, px) =>
        s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ px
      }.toArray
      val parsed = MultimodalOps.parsePpmStream(payload)
      assert(parsed.length === frames.length)
      parsed.zip(frames).foreach { case (img, (w, h, px)) =>
        assert(img.width === w); assert(img.height === h)
        assert(img.pixels.sameElements(px))
      }
    }
    // truncated last frame fails loudly, never silently drops it
    val good = MultimodalOps.videoBytes(3L)
    intercept[IllegalArgumentException] {
      MultimodalOps.parsePpmStream(good.dropRight(1))
    }
  }

  test("resizeNearest maps output pixels to the floor-scaled source pixel") {
    // 2×2 checkerboard-ish source upscaled to 4×4: each source pixel
    // covers a 2×2 output block (nearest-neighbour floor semantics).
    val px = Array[Byte](
      1, 2, 3,    10, 20, 30,   // row 0: (r,g,b) of pixels (0,0) (1,0)
      40, 50, 60, 70, 80, 90)   // row 1
    val img = MultimodalOps.PpmImage(2, 2, 255, px)
    val out = MultimodalOps.resizeNearest(img, 4, 4)
    assert(out.length === 3 * 4 * 4)
    def rgb(x: Int, y: Int) = out.slice(3 * (y * 4 + x), 3 * (y * 4 + x) + 3).toSeq
    assert(rgb(0, 0) === Seq[Byte](1, 2, 3))
    assert(rgb(1, 1) === Seq[Byte](1, 2, 3))
    assert(rgb(2, 0) === Seq[Byte](10, 20, 30))
    assert(rgb(1, 2) === Seq[Byte](40, 50, 60))
    assert(rgb(3, 3) === Seq[Byte](70, 80, 90))
    // identity resize returns the raster unchanged
    assert(MultimodalOps.resizeNearest(img, 2, 2).toSeq === px.toSeq)
  }

  test("resizeImages emits exactly-sized deterministic payloads") {
    val media = MultimodalOps.withImagePayload(
      spark, Tables.load(spark, sf, "documents"))
    val resized = MultimodalOps.resizeImages(spark, media, 8, 8)
    assert(resized.filter(octet_length(col("resized")) =!= 3 * 8 * 8).count() === 0)
    assert(resized.count() === media.count())
    // deterministic: same input, same bytes
    val a = MultimodalOps.resizeImages(spark, media, 8, 8).orderBy("doc_id")
      .collect().map(_.getAs[Array[Byte]]("resized").toSeq)
    val b = MultimodalOps.resizeImages(spark, media, 8, 8).orderBy("doc_id")
      .collect().map(_.getAs[Array[Byte]]("resized").toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("resizedStats checksum is order-sensitive (catches byte transpositions)") {
    import spark.implicits._
    val fwd = Seq((1L, "t", 1, 1, Array[Byte](1, 2, 3)))
      .toDF("doc_id", "media_type", "out_w", "out_h", "resized")
    val rev = Seq((1L, "t", 1, 1, Array[Byte](3, 2, 1)))
      .toDF("doc_id", "media_type", "out_w", "out_h", "resized")
    val sf_ = MultimodalOps.resizedStats(spark, fwd).collect().head
    val sr = MultimodalOps.resizedStats(spark, rev).collect().head
    assert(sf_.getAs[Long]("byte_sum") === sr.getAs[Long]("byte_sum"))
    assert(sf_.getAs[Long]("byte_checksum") !== sr.getAs[Long]("byte_checksum"))
    assert(sf_.getAs[Long]("byte_checksum") === (1 * 1 + 2 * 2 + 3 * 3).toLong)
  }

  test("image near-dup: perturbed copy found by the banded SimHash search; inverse is far") {
    import spark.implicits._
    // 8×8 bimodal image (resize is identity): left half bright, right
    // half dark — every gray sits far from the mean, so a single-pixel
    // perturbation flips exactly that pixel's bit
    def ppm(pix: Int => Int): Array[Byte] = {
      val header = "P6\n8 8\n255\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + 192)
      System.arraycopy(header, 0, out, 0, header.length)
      (0 until 192).foreach(i => out(header.length + i) = pix(i / 3).toByte)
      out
    }
    val base = ppm(p => if (p % 8 < 4) 200 else 10)
    val noised = ppm(p => if (p == 44) 200 else if (p % 8 < 4) 200 else 10)
    val inverse = ppm(p => if (p % 8 < 4) 10 else 200)
    val media = Seq((1L, base), (2L, noised), (3L, inverse))
      .toDF("doc_id", "payload")
    val hashes = MultimodalOps.imageHashes(spark, media)
    val h = hashes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(java.lang.Long.bitCount(h(1L) ^ h(2L)) === 1, "one flipped pixel, one bit")
    assert(java.lang.Long.bitCount(h(1L) ^ h(3L)) >= 32, "inverse must be far")
    // the TEXT dedup pair search works unchanged on image hashes
    val pairs = graft.operators.DedupOps
      .simHashNearPairs(hashes.withColumnRenamed("image_hash", "simhash"),
        maxHamming = 3)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("audio: parser rejects malformed payloads; window energy exact on a known clip") {
    import spark.implicits._
    // 20 samples: one full window of 16 (values 0..15) + ragged tail of 4
    val header = "A1\n20 8000\n".getBytes("US-ASCII")
    val clip = header ++ (0 until 20).map(_.toByte).toArray
    val rows = MultimodalOps.audioFeatures(spark,
        Seq((1L, clip)).toDF("doc_id", "payload"))
      .orderBy("win_idx").collect()
    assert(rows.length === 2)
    val full = rows(0); val tail = rows(1)
    val expFull = (0 until 16).map(v => v * v).sum.toLong
    val expTail = (16 until 20).map(v => v * v).sum.toLong
    assert(full.getInt(2) === 16 && full.getLong(3) === expFull)
    assert(full.getDouble(4) === math.sqrt(expFull.toDouble / 16))
    assert(tail.getInt(2) === 4 && tail.getLong(3) === expTail)
    // malformed: wrong magic and truncated raster both throw
    intercept[Exception] {
      MultimodalOps.parseAudio("XX\n4 8000\nabcd".getBytes("US-ASCII"))
    }
    intercept[Exception] {
      MultimodalOps.parseAudio("A1\n99 8000\nab".getBytes("US-ASCII"))
    }
  }

  test("video near-dup: re-cut copy found by shared frame hashes, disjoint video not") {
    import spark.implicits._
    // three distinct bimodal frames; a frame stream = concatenated PPMs
    def frame(bright: Int => Boolean): Array[Byte] = {
      val header = "P6\n8 8\n255\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + 192)
      System.arraycopy(header, 0, out, 0, header.length)
      (0 until 192).foreach(i =>
        out(header.length + i) = (if (bright(i / 3)) 200 else 10).toByte)
      out
    }
    val f1 = frame(p => p % 8 < 4)
    val f2 = frame(p => p / 8 < 4)
    val f3 = frame(p => (p / 8 + p % 8) % 2 == 0)
    val f2noised = frame(p => p == 60 || p / 8 < 4) // one flipped pixel
    val disjoint1 = frame(p => p % 8 < 2)
    val disjoint2 = frame(p => p / 8 < 2)
    def video(frames: Array[Byte]*): Array[Byte] = frames.reduce(_ ++ _)
    val media = Seq(
      (1L, video(f1, f2, f3)),
      (2L, video(f3, f1, f2noised)), // re-cut copy: 2 of 3 frames exact
      (3L, video(disjoint1, disjoint2)))
      .toDF("doc_id", "payload")
    val pairs = MultimodalOps.videoNearDups(spark, media, minSharedFrames = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs === Set((1L, 2L, 2L)),
      s"expected exactly the planted re-cut pair, got $pairs")
  }

  test("PNG via ImageIO round-trips the raster formula byte-for-byte (lossless)") {
    for (id <- Seq(0L, 1L, 7L, 63L, 499L)) {
      val dec = MultimodalOps.decodeViaImageIO(MultimodalOps.pngBytes(id))
      assert(dec.width === MultimodalOps.imageWidth(id))
      assert(dec.height === MultimodalOps.imageHeight(id))
      dec.pixels.zipWithIndex.foreach { case (b, i) =>
        assert((b & 0xFF) === MultimodalOps.pixelByte(id, i), s"doc $id byte $i")
      }
    }
    // undecodable bytes fail loudly, never fabricate a raster
    intercept[IllegalArgumentException] {
      MultimodalOps.decodeViaImageIO(Array[Byte](1, 2, 3, 4))
    }
  }

  test("JPEG via ImageIO: geometry exact, decode perceptually faithful") {
    val invariants = MultimodalOps.decodeJpegInvariants(spark,
        MultimodalOps.withJpegPayload(spark,
          Tables.load(spark, sf, "documents")))
      .collect()
    assert(invariants.length ===
      Tables.load(spark, sf, "documents").count())
    invariants.foreach { r =>
      assert(r.getAs[Int]("width") === MultimodalOps.JpegSide, s"doc ${r.getLong(0)}")
      assert(r.getAs[Int]("height") === MultimodalOps.JpegSide)
      assert(r.getAs[Int]("hash_near") === 1, s"aHash drift doc ${r.getLong(0)}")
      assert(r.getAs[Int]("means_close") === 1, s"mean drift doc ${r.getLong(0)}")
    }
  }

  test("JPEG near-dup: perturbed re-encode found by the banded SimHash search") {
    import spark.implicits._
    // a perturbed copy: one 8×8 block's gray nudged by +4 — survives the
    // lossy round-trip as a near-identical aHash; a different doc's
    // fixture is a genuinely different image
    val base = MultimodalOps.jpegRaster(5L)
    val perturbed = {
      val px = base.pixels.clone()
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          val i = 3 * (y * MultimodalOps.JpegSide + x)
          val g = math.min(255, (px(i) & 0xFF) + 4).toByte
          px(i) = g; px(i + 1) = g; px(i + 2) = g
          x += 1
        }
        y += 1
      }
      MultimodalOps.PpmImage(base.width, base.height, 255, px)
    }
    val media = Seq(
      (1L, MultimodalOps.encodeJpeg(base)),
      (2L, MultimodalOps.encodeJpeg(perturbed)),
      (3L, MultimodalOps.encodeJpeg(MultimodalOps.jpegRaster(6L))))
      .toDF("doc_id", "payload")
    import org.apache.spark.sql.functions.{col, udf}
    val hashUdf = udf((bytes: Array[Byte]) =>
      MultimodalOps.aHash64(MultimodalOps.decodeViaImageIO(bytes)))
    val hashes = media.select(col("doc_id"),
      hashUdf(col("payload")).as("simhash"))
    val pairs = graft.operators.DedupOps
      .simHashNearPairs(hashes, maxHamming = 3)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)),
      s"expected exactly the planted perturbed-JPEG pair, got $pairs")
  }

  test("WAV via javax.sound.sampled round-trips the signed PCM formula exactly") {
    for (id <- Seq(0L, 1L, 31L, 499L)) {
      val clip = MultimodalOps.decodeWav(MultimodalOps.wavBytes(id))
      assert(clip.rate === MultimodalOps.WavRate)
      assert(clip.bits === 16 && clip.channels === 1)
      assert(clip.samples.length === MultimodalOps.wavSampleCount(id))
      clip.samples.zipWithIndex.foreach { case (v, i) =>
        assert(v === MultimodalOps.wavSample(id, i), s"doc $id sample $i")
      }
      // negative samples actually occur — the sign path is exercised
      if (id == 0L) assert(clip.samples.exists(_ < 0))
    }
    // undecodable bytes fail loudly, never fabricate samples
    intercept[Exception] {
      MultimodalOps.decodeWav(Array[Byte](1, 2, 3, 4))
    }
  }

  test("WAV features match a hand-computed window on a known clip") {
    import spark.implicits._
    val media = MultimodalOps.withWavPayload(spark,
      Seq(3L).toDF("doc_id"))
    val rows = MultimodalOps.wavFeatures(spark, media)
      .orderBy("win_idx").collect()
    val n = MultimodalOps.wavSampleCount(3L)
    assert(rows.map(_.getAs[Int]("win_len")).sum === n)
    val first = rows.head
    var ss = 0L
    (0 until 16).foreach { i =>
      val v = MultimodalOps.wavSample(3L, i).toLong; ss += v * v
    }
    assert(first.getAs[Long]("sum_sq") === ss)
    assert(first.getAs[Int]("sample_rate") === 8000)
    assert(first.getAs[Int]("n_samples") === n)
    assert(math.abs(first.getAs[Double]("rms") - math.sqrt(ss / 16.0)) < 1e-12)
  }

  test("animated GIF via ImageIO round-trips the gray raster formula byte-for-byte") {
    val id = 7L
    val frames = MultimodalOps.decodeGifFrames(MultimodalOps.gifBytes(id))
    assert(frames.length === MultimodalOps.videoFrameCount(id))
    frames.zipWithIndex.foreach { case (img, f) =>
      assert(img.width === MultimodalOps.imageWidth(id))
      assert(img.height === MultimodalOps.imageHeight(id))
      (0 until img.width * img.height).foreach { p =>
        val v = MultimodalOps.gifFramePixel(id, f, p)
        assert((img.pixels(3 * p) & 0xFF) === v, s"frame $f pixel $p R")
        assert((img.pixels(3 * p + 1) & 0xFF) === v, s"frame $f pixel $p G")
        assert((img.pixels(3 * p + 2) & 0xFF) === v, s"frame $f pixel $p B")
      }
    }
  }

  test("GIF near-dup: planted re-cut found by shared frame hashes, disjoint GIF not") {
    import spark.implicits._
    val base = 11L
    val w = MultimodalOps.imageWidth(base); val h = MultimodalOps.imageHeight(base)
    def frame(f: Int): MultimodalOps.PpmImage = {
      val px = new Array[Byte](3 * w * h)
      (0 until w * h).foreach { p =>
        val v = MultimodalOps.gifFramePixel(base, f, p).toByte
        px(3 * p) = v; px(3 * p + 1) = v; px(3 * p + 2) = v
      }
      MultimodalOps.PpmImage(w, h, 255, px)
    }
    def flat(g: Int): MultimodalOps.PpmImage =
      MultimodalOps.PpmImage(w, h, 255,
        Array.fill(3 * w * h)(g.toByte))
    // doc 1: frames 0-2; doc 2: a RE-CUT — frames 2,1 kept, new tail;
    // doc 3: fully disjoint flat frames
    val media = Seq(
      (1L, "image/gif", MultimodalOps.encodeGifGray(Seq(frame(0), frame(1), frame(2)))),
      (2L, "image/gif", MultimodalOps.encodeGifGray(Seq(frame(2), frame(1), flat(200)))),
      (3L, "image/gif", MultimodalOps.encodeGifGray(Seq(flat(10), flat(90)))))
      .toDF("doc_id", "media_type", "payload")
    val pairs = MultimodalOps.gifNearDups(spark, media, minSharedFrames = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq === Seq((1L, 2L, 2L)))
  }

  test("AIFF via javax.sound round-trips the signed PCM formula; byte-swap fails loud") {
    val id = 5L
    val clip = MultimodalOps.decodeAiff(MultimodalOps.aiffBytes(id))
    val n = MultimodalOps.aiffSampleCount(id)
    assert(clip.samples.length === n)
    assert(clip.bits === 16 && clip.channels === 1)
    (0 until n).foreach { i =>
      assert(clip.samples(i) === MultimodalOps.aiffSample(id, i), s"sample $i")
    }
    // the endianness negative: reassembling the same 16-bit samples
    // little-endian (a WAV-style decoder misapplied to AIFF bytes)
    // yields byte-swapped values that do NOT reproduce the formula
    def swap16(v: Int): Int = (((v & 0xFF) << 8) | ((v >> 8) & 0xFF)).toShort.toInt
    val swapped = clip.samples.map(swap16)
    assert(swapped.zipWithIndex.exists { case (v, i) =>
      v !== MultimodalOps.aiffSample(id, i)
    })
    // and the decoder refuses a little-endian (WAV) payload outright
    intercept[IllegalArgumentException] {
      MultimodalOps.decodeAiff(MultimodalOps.wavBytes(id))
    }
  }
}
