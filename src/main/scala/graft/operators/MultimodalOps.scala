package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder brief): image/audio/video payloads
  * travel as opaque `binary` columns with typed metadata; decode /
  * feature-extract / frame-sample are structured so the Spark side —
  * schema, partitioning, batch shape — is real and tested, while the
  * codec itself is a clearly-marked deterministic STUB (no image/audio
  * libraries exist in this environment).
  *
  * Scale design: payloads stay columnar (parquet binary) end to end; all
  * transforms are narrow per-row/per-partition ops — no shuffle; a real
  * decoder would slot into `decodeBytes` unchanged, preserving the
  * partition-iterator batch shape (the JVM analogue of a pandas-batch
  * UDF: one decoder init per partition, then row-at-a-time reuse).
  */
object MultimodalOps {

  /** Typed metadata extracted by "decode". */
  final case class MediaMeta(
      doc_id: Long, byte_len: Int, media_type: String,
      width: Int, height: Int, n_frames: Int)

  /** ======== STUB ========
    * Deterministic fake decoder: derives plausible metadata from the
    * payload bytes alone. A real implementation would parse the codec
    * header (JPEG SOF / WAV fmt / MP4 moov) right here with the same
    * signature: bytes in, typed metadata out.
    */
  def decodeBytes(docId: Long, mediaType: String, payload: Array[Byte]): MediaMeta = {
    val len = payload.length
    MediaMeta(docId, len, mediaType,
      width = 64 + (len % 577), height = 64 + (len % 417),
      n_frames = 1 + (len % 30))
  }

  /** Attach an opaque binary payload + media_type to the documents table
    * (payload = UTF-8 bytes of `text` — deterministic, testdata-derived).
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      col("text").cast("binary").as("payload"),
      concat(lit("media/"), col("source")).as("media_type"))

  /** Decode pass: mapPartitions over the binary column — per-partition
    * decoder lifecycle, bounded memory (one payload at a time), output
    * is a typed Dataset whose schema downstream relational ops consume.
    */
  def decode(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // real codecs initialize per-partition state here (decoder,
        // scratch buffers); the stub needs none.
        it.map { case (id, mt, bytes) => decodeBytes(id, mt, bytes) }
      }
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

  /** ======== STUB ========
    * Resize: produce a fixed-size payload from each media blob by
    * stride-sampling its bytes. A real implementation decodes, rescales
    * pixels, and re-encodes in exactly this spot — the per-partition
    * iterator shape is where a native codec/JNI library lives (one init
    * per partition, buffer reuse per row). Output payloads are exactly
    * `targetBytes` (zero-padded when the source is smaller).
    */
  def resizeBytes(payload: Array[Byte], targetBytes: Int): Array[Byte] = {
    val out = new Array[Byte](targetBytes)
    if (payload.nonEmpty) {
      val stride = math.max(1, payload.length / targetBytes)
      var i = 0
      while (i < targetBytes && i * stride < payload.length) {
        out(i) = payload(i * stride)
        i += 1
      }
    }
    out
  }

  def resize(spark: SparkSession, media: DataFrame, targetBytes: Int): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // real codecs allocate decode/encode buffers here, once
        it.map { case (id, mt, bytes) => (id, mt, resizeBytes(bytes, targetBytes)) }
      }
      .toDF("doc_id", "media_type", "resized")
  }

  /** Feature extraction stub: a deterministic k-dim pseudo-embedding
    * from payload bytes (seeded xxhash64 per dimension) — vectorized
    * expressions, the shape a real CLIP/encoder batch UDF would emit.
    */
  def fakeFeatures(media: DataFrame, k: Int = 8): DataFrame =
    media.select(col("doc_id"),
      array((0 until k).map(i =>
        pmod(xxhash64(col("payload"), lit(i)), lit(1000)).cast("double") / 1000.0): _*)
        .as("features"))
}
