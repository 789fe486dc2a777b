package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.MultimodalOps

/** Multimodal binary-column queries. The payload is the UTF-8 bytes of
  * `documents.text` (opaque to the engine — all ops treat it as binary);
  * the DuckDB oracle computes the same values on the string side, which
  * is byte-identical for this ASCII corpus (DuckDB 1.0 lacks BLOB
  * substring/sha256).
  */
object MultimodalQueries extends QueryPack {

  val queries: Seq[Q] = Seq(

    // Binary payload + content hashes: octet_length, md5, sha256 over
    // the opaque bytes — the dedup/integrity layer for media columns.
    Q("m1_binary_meta",
      (s, d) => MultimodalOps
        .withPayload(Tables.load(s, d, "documents"))
        .select(col("doc_id"), col("media_type"),
          octet_length(col("payload")).as("byte_len"),
          md5(col("payload")).as("payload_md5"),
          sha2(col("payload"), 256).as("payload_sha256"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, 'media/' || source AS media_type,
             CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS byte_len,
             md5(text) AS payload_md5,
             sha256(text) AS payload_sha256
             FROM documents ORDER BY doc_id""")),

    // Frame-sampling plumbing: every 4th fake frame, frame payload =
    // 8-byte slice, fingerprinted. Exercises binary slicing + ordered
    // explode — the exact shape of real video frame extraction.
    Q("m2_frame_sample",
      (s, d) => MultimodalOps
        .frameSample(
          MultimodalOps.withPayload(Tables.load(s, d, "documents")), step = 4)
        .select(col("doc_id"), col("frame_idx"),
          md5(col("frame_payload")).as("frame_md5"))
        .orderBy("doc_id", "frame_idx"),
      Some("""WITH m AS (SELECT doc_id, text,
               1 + octet_length(CAST(text AS BLOB)) % 30 AS n_frames FROM documents),
             f AS (SELECT doc_id, text, n_frames,
               unnest(range(0, n_frames, 4)) AS frame_idx FROM m)
             SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
               md5(substr(text, CAST(frame_idx AS INTEGER) * 8 + 1, 8)) AS frame_md5
             FROM f WHERE octet_length(CAST(text AS BLOB)) >= frame_idx * 8 + 8
             ORDER BY doc_id, frame_idx""")),

    // Decode + feature stub: typed metadata from the (stubbed) decoder
    // and a deterministic pseudo-embedding. Not oracle-expressible
    // (xxhash64, mapPartitions) → rows-only; MultimodalSpec pins the
    // values and the batch plumbing. The feature vector is serialized to
    // a csv string so the driver's comparator can sort/hash the frame
    // (raw array<double> is unhashable on the pandas side).
    Q("m3_decode_features",
      (s, d) => {
        val media = MultimodalOps.withPayload(Tables.load(s, d, "documents"))
        MultimodalOps.decode(s, media).toDF()
          .join(MultimodalOps.fakeFeatures(media), "doc_id")
          .withColumn("features",
            concat_ws(",", col("features").cast("array<string>")))
          .orderBy("doc_id")
      },
      None),

    // Resize stub surfaced as a query: fixed-size payloads via the
    // per-partition decoder shape (MultimodalOps.resize). Byte-stride
    // sampling over BLOBs is not oracle-expressible → rows-only;
    // MultimodalSpec pins output sizes and determinism.
    Q("m4_resize",
      (s, d) => MultimodalOps
        .resize(s,
          MultimodalOps.withPayload(Tables.load(s, d, "documents")),
          targetBytes = 64)
        .select(col("doc_id"), col("media_type"),
          octet_length(col("resized")).as("resized_len"),
          md5(col("resized")).as("resized_md5"))
        .orderBy("doc_id"),
      None)
  )
}
