package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.MultimodalOps

/** Multimodal binary-column queries. m1/m2 treat media as fully opaque
  * bytes (payload = UTF-8 of `documents.text`; the DuckDB oracle
  * computes the same values on the string side — byte-identical for
  * this ASCII corpus, and DuckDB 1.0 lacks BLOB substring/sha256).
  * m3/m4 decode REAL binary PPM images with a pure-JVM parser
  * (MultimodalOps.parsePpm); their oracles replay the deterministic
  * payload-generator formula instead of parsing binary.
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

    // REAL video frame sampling: each document carries a multi-frame
    // payload of videoFrameCount(id) concatenated P6 rasters (frame f
    // raster byte i = (id·31 + f·17 + i·7) mod 256); the Spark side
    // walks the actual frame boundaries with the PPM parser and emits
    // every 2nd frame's geometry + order-sensitive byte stats. The
    // oracle replays the generator formula (DuckDB cannot parse BLOBs),
    // so a boundary mis-parse or frame-index slip breaks the hash.
    Q("m2_frame_sample",
      (s, d) => MultimodalOps
        .frameSample(s,
          MultimodalOps.withVideoPayload(s, Tables.load(s, d, "documents")),
          step = 2)
        .orderBy("doc_id", "frame_idx"),
      Some("""WITH dims AS (SELECT doc_id,
               CAST(8 + doc_id % 9 AS INTEGER) AS width,
               CAST(8 + doc_id % 7 AS INTEGER) AS height,
               2 + doc_id % 4 AS n_frames FROM documents),
             fr AS (SELECT doc_id, width, height,
               unnest(range(0, n_frames, 2)) AS f FROM dims),
             px AS (SELECT doc_id, width, height, f,
               unnest(range(0, 3 * width * height)) AS j FROM fr),
             v AS (SELECT doc_id, width, height, f, j,
               (doc_id*31 + f*17 + j*7) % 256 AS v FROM px),
             agg AS (SELECT doc_id, f, width, height,
               sum(v) AS byte_sum, sum(v * (j + 1)) AS byte_checksum
              FROM v GROUP BY 1, 2, 3, 4)
             SELECT doc_id, CAST(f AS INTEGER) AS frame_idx, width, height,
               CAST(byte_sum AS BIGINT) AS byte_sum,
               CAST(byte_checksum AS BIGINT) AS byte_checksum
             FROM agg ORDER BY doc_id, frame_idx""")),

    // REAL image decode + feature extraction: each document carries a
    // deterministic binary P6 PPM payload (MultimodalOps.ppmBytes —
    // raster byte i = (doc_id·31 + i·7) mod 256); the Spark side parses
    // the actual bytes (header tokens, channel-interleaved raster) and
    // emits geometry + per-channel mean intensity. The oracle replays
    // the generator FORMULA in SQL (DuckDB 1.0 cannot parse BLOBs), so
    // any decoder defect — header mis-parse, interleave bug, wrong
    // raster offset — breaks the hash. byte_len = 9 + len(str(w)) +
    // len(str(h)) + 3wh is the exact P6 encoding length. Means divide
    // exact integer sums once in IEEE double — bit-identical engines.
    Q("m3_decode_features",
      (s, d) => MultimodalOps
        .decodeImages(s,
          MultimodalOps.withImagePayload(s, Tables.load(s, d, "documents")))
        .toDF()
        .orderBy("doc_id"),
      Some("""WITH dims AS (SELECT doc_id,
               CAST(8 + doc_id % 9 AS INTEGER) AS width,
               CAST(8 + doc_id % 7 AS INTEGER) AS height FROM documents),
             px AS (SELECT doc_id, width, height,
               unnest(range(0, width * height)) AS p FROM dims),
             sums AS (SELECT doc_id, width, height,
               sum((doc_id*31 + (3*p    )*7) % 256) AS sr,
               sum((doc_id*31 + (3*p + 1)*7) % 256) AS sg,
               sum((doc_id*31 + (3*p + 2)*7) % 256) AS sb
              FROM px GROUP BY 1, 2, 3)
             SELECT doc_id, 'image/x-portable-pixmap' AS media_type,
               CAST(9 + len(CAST(width AS VARCHAR)) + len(CAST(height AS VARCHAR))
                 + 3 * width * height AS INTEGER) AS byte_len,
               width, height, CAST(255 AS INTEGER) AS maxval,
               CAST(sr AS DOUBLE) / (width * height) AS mean_r,
               CAST(sg AS DOUBLE) / (width * height) AS mean_g,
               CAST(sb AS DOUBLE) / (width * height) AS mean_b
             FROM sums ORDER BY doc_id""")),

    // REAL nearest-neighbour resize to 8×8 over the decoded raster:
    // output pixel (x,y) = source pixel (⌊x·w/8⌋, ⌊y·h/8⌋), then an
    // order-sensitive byte checksum (Σ v·(i+1)) pins the exact output
    // bytes — a transposed, channel-swapped, or off-by-one resample
    // matches out_len but never byte_checksum. The oracle replays the
    // same index arithmetic from the payload formula (floor division
    // in both engines: `//` vs positive Int division).
    Q("m4_resize",
      (s, d) => MultimodalOps
        .resizedStats(s, MultimodalOps.resizeImages(s,
          MultimodalOps.withImagePayload(s, Tables.load(s, d, "documents")),
          outW = 8, outH = 8))
        .orderBy("doc_id"),
      Some("""WITH dims AS (SELECT doc_id, 8 + doc_id % 9 AS w,
               8 + doc_id % 7 AS h FROM documents),
             opx AS (SELECT doc_id, w, h, unnest(range(0, 64)) AS o FROM dims),
             mapped AS (SELECT doc_id, o,
               3 * (((o // 8) * h // 8) * w + ((o % 8) * w // 8)) AS src
              FROM opx),
             ch AS (SELECT doc_id, o, src, unnest([0, 1, 2]) AS c FROM mapped),
             vals AS (SELECT doc_id, 3*o + c AS j,
               (doc_id*31 + (src + c)*7) % 256 AS v FROM ch),
             agg AS (SELECT doc_id, sum(v) AS byte_sum,
               sum(v * (j + 1)) AS byte_checksum FROM vals GROUP BY 1)
             SELECT doc_id, 'image/x-portable-pixmap' AS media_type,
               CAST(8 AS INTEGER) AS out_w, CAST(8 AS INTEGER) AS out_h,
               CAST(192 AS INTEGER) AS out_len,
               CAST(byte_sum AS BIGINT) AS byte_sum,
               CAST(byte_checksum AS BIGINT) AS byte_checksum
             FROM agg ORDER BY doc_id""")),

    // Perceptual image hash (MultimodalOps.aHash64): decode → 8×8
    // nearest resample → gray bits vs mean, all integer arithmetic —
    // the oracle replays the resize index mapping (m4's CTE) and the
    // strict g·64 > Σg comparison, packing bits with the d3 trick
    // (power(2, b) is exact for powers of two; bit 63 is the BIGINT
    // sign bit). Near-dup IMAGE pair search over these hashes reuses
    // DedupOps.simHashNearPairs unchanged (MultimodalSpec).
    Q("m5_image_hash",
      (s, d) => MultimodalOps
        .imageHashes(s,
          MultimodalOps.withImagePayload(s, Tables.load(s, d, "documents")))
        .orderBy("doc_id"),
      Some("""WITH dims AS (SELECT doc_id, 8 + doc_id % 9 AS w,
               8 + doc_id % 7 AS h FROM documents),
             opx AS (SELECT doc_id, w, h, unnest(range(0, 64)) AS o FROM dims),
             mapped AS (SELECT doc_id, o,
               3 * (((o // 8) * h // 8) * w + ((o % 8) * w // 8)) AS src
              FROM opx),
             gray AS (SELECT doc_id, o,
                 (doc_id*31 + (src    )*7) % 256
               + (doc_id*31 + (src + 1)*7) % 256
               + (doc_id*31 + (src + 2)*7) % 256 AS g FROM mapped),
             tot AS (SELECT doc_id, sum(g) AS sg FROM gray GROUP BY 1),
             h AS (SELECT gray.doc_id,
               CAST(sum(CASE WHEN g * 64 > sg THEN
                 (CASE WHEN o = 63 THEN -9223372036854775808
                       ELSE CAST(power(2, o) AS BIGINT) END)
                 ELSE 0 END) AS BIGINT) AS image_hash
              FROM gray JOIN tot ON gray.doc_id = tot.doc_id
              GROUP BY gray.doc_id)
             SELECT doc_id, image_hash FROM h ORDER BY doc_id""")),

    // Per-frame perceptual hashes over the multi-frame video corpus —
    // the video-dedup fingerprint (m5's aHash per genuinely-parsed
    // frame; near-dup pairing over these reuses the d2 inverted-index
    // shape, MultimodalOps.videoNearDups + MultimodalSpec).
    Q("m6_video_frame_hashes",
      (s, d) => MultimodalOps
        .frameHashes(s,
          MultimodalOps.withVideoPayload(s, Tables.load(s, d, "documents")))
        .orderBy("doc_id", "frame_idx"),
      Some("""WITH dims AS (SELECT doc_id, 8 + doc_id % 9 AS w,
               8 + doc_id % 7 AS h, 2 + doc_id % 4 AS n_frames FROM documents),
             fr AS (SELECT doc_id, w, h, unnest(range(0, n_frames)) AS f FROM dims),
             opx AS (SELECT doc_id, w, h, f, unnest(range(0, 64)) AS o FROM fr),
             mapped AS (SELECT doc_id, f, o,
               3 * (((o // 8) * h // 8) * w + ((o % 8) * w // 8)) AS src
              FROM opx),
             gray AS (SELECT doc_id, f, o,
                 (doc_id*31 + f*17 + (src    )*7) % 256
               + (doc_id*31 + f*17 + (src + 1)*7) % 256
               + (doc_id*31 + f*17 + (src + 2)*7) % 256 AS g FROM mapped),
             tot AS (SELECT doc_id, f, sum(g) AS sg FROM gray GROUP BY 1, 2),
             h AS (SELECT gray.doc_id, gray.f,
               CAST(sum(CASE WHEN g * 64 > sg THEN
                 (CASE WHEN o = 63 THEN -9223372036854775808
                       ELSE CAST(power(2, o) AS BIGINT) END)
                 ELSE 0 END) AS BIGINT) AS frame_hash
              FROM gray JOIN tot ON gray.doc_id = tot.doc_id AND gray.f = tot.f
              GROUP BY 1, 2)
             SELECT doc_id, CAST(f AS INTEGER) AS frame_idx, frame_hash
             FROM h ORDER BY doc_id, frame_idx""")),

    // REAL JPEG decode via the public JDK codec (javax.imageio): each
    // document carries a deterministic 64×64 JPEG (constant-gray 8×8
    // blocks — pure-DC in the DCT, so high-quality JPEG reproduces them
    // within ~2 gray levels). JPEG is lossy, so an exact-pixel oracle is
    // impossible BY THE CODEC'S NATURE; the oracle pins what the codec
    // guarantees — geometry, plus two perceptual invariants computed
    // Spark-side against the pristine fixture raster (aHash Hamming ≤ 6,
    // channel means within 2 levels). Any decode defect (geometry, channel
    // slip, raster corruption, codec failure) flips an invariant to 0 and
    // breaks the hash. The lossless ImageIO path with a FULLY-replayed
    // oracle is m9 below; near-dup detection over perturbed JPEGs rides
    // the unchanged SimHash bands (MultimodalSpec).
    Q("m8_decode_jpeg",
      (s, d) => MultimodalOps
        .decodeJpegInvariants(s,
          MultimodalOps.withJpegPayload(s, Tables.load(s, d, "documents")))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, 'image/jpeg' AS media_type,
             CAST(64 AS INTEGER) AS width, CAST(64 AS INTEGER) AS height,
             CAST(1 AS INTEGER) AS hash_near,
             CAST(1 AS INTEGER) AS means_close
             FROM documents ORDER BY doc_id""")),

    // REAL PNG decode via javax.imageio with FULL oracle replay: the
    // payload is the m3 raster formula PNG-encoded by the JDK writer;
    // PNG is lossless, so the decoded raster equals the formula
    // byte-for-byte and the oracle replays geometry, exact channel
    // means (m3's CTE), and the aHash fingerprint (m5's CTE) — m3+m5-
    // strength verification of a genuine compressed-codec decode
    // (inflate + de-filter), not the hand-rolled PPM parser.
    Q("m9_decode_png",
      (s, d) => MultimodalOps
        .decodeImageIoFeatures(s,
          MultimodalOps.withPngPayload(s, Tables.load(s, d, "documents")))
        .orderBy("doc_id"),
      Some("""WITH dims AS (SELECT doc_id,
               CAST(8 + doc_id % 9 AS INTEGER) AS width,
               CAST(8 + doc_id % 7 AS INTEGER) AS height FROM documents),
             px AS (SELECT doc_id, width, height,
               unnest(range(0, width * height)) AS p FROM dims),
             sums AS (SELECT doc_id, width, height,
               sum((doc_id*31 + (3*p    )*7) % 256) AS sr,
               sum((doc_id*31 + (3*p + 1)*7) % 256) AS sg,
               sum((doc_id*31 + (3*p + 2)*7) % 256) AS sb
              FROM px GROUP BY 1, 2, 3),
             opx AS (SELECT doc_id, width AS w, height AS h,
               unnest(range(0, 64)) AS o FROM dims),
             mapped AS (SELECT doc_id, o,
               3 * (((o // 8) * h // 8) * w + ((o % 8) * w // 8)) AS src
              FROM opx),
             gray AS (SELECT doc_id, o,
                 (doc_id*31 + (src    )*7) % 256
               + (doc_id*31 + (src + 1)*7) % 256
               + (doc_id*31 + (src + 2)*7) % 256 AS g FROM mapped),
             tot AS (SELECT doc_id, sum(g) AS tg FROM gray GROUP BY 1),
             hsh AS (SELECT gray.doc_id,
               CAST(sum(CASE WHEN g * 64 > tg THEN
                 (CASE WHEN o = 63 THEN -9223372036854775808
                       ELSE CAST(power(2, o) AS BIGINT) END)
                 ELSE 0 END) AS BIGINT) AS image_hash
              FROM gray JOIN tot ON gray.doc_id = tot.doc_id
              GROUP BY gray.doc_id)
             SELECT s.doc_id, 'image/png' AS media_type, s.width, s.height,
               CAST(s.sr AS DOUBLE) / (s.width * s.height) AS mean_r,
               CAST(s.sg AS DOUBLE) / (s.width * s.height) AS mean_g,
               CAST(s.sb AS DOUBLE) / (s.width * s.height) AS mean_b,
               h.image_hash
             FROM sums s JOIN hsh h ON s.doc_id = h.doc_id
             ORDER BY s.doc_id""")),

    // Audio modality (MultimodalOps.audioFeatures): REAL byte-level
    // parse of the A1 PCM container, then 16-sample windowed energy —
    // integer sample-square sums, one exact division per window, and an
    // IEEE-correctly-rounded sqrt, so the full composition hash-matches
    // the oracle's replay of the sample formula.
    Q("m7_audio_features",
      (s, d) => MultimodalOps
        .audioFeatures(s,
          MultimodalOps.withAudioPayload(s, Tables.load(s, d, "documents")))
        .orderBy("doc_id", "win_idx"),
      Some("""WITH dims AS (SELECT doc_id,
               64 + doc_id % 32 AS n FROM documents),
             sm AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM dims),
             v AS (SELECT doc_id, n, i, CAST(i // 16 AS INTEGER) AS win_idx,
               (doc_id*13 + i*11) % 256 AS v FROM sm),
             agg AS (SELECT doc_id, win_idx,
               CAST(count(*) AS INTEGER) AS win_len,
               CAST(sum(v * v) AS BIGINT) AS sum_sq FROM v GROUP BY 1, 2)
             SELECT doc_id, win_idx, win_len, sum_sq,
               sqrt(CAST(sum_sq AS DOUBLE) / win_len) AS rms
             FROM agg ORDER BY doc_id, win_idx""")),

    // REAL WAV decode via the public JDK codec (javax.sound.sampled):
    // each document carries a RIFF/WAVE payload written by the JDK's
    // own encoder (16-bit signed LE mono PCM @ 8 kHz), decoded back
    // with AudioSystem.getAudioInputStream — real container parse +
    // frame reassembly, the audio analogue of m9's PNG round trip.
    // WAV PCM is lossless, so the oracle replays the full signed
    // sample formula; an endianness slip or header mis-parse cannot
    // hash-match.
    Q("m10_decode_wav",
      (s, d) => MultimodalOps
        .wavFeatures(s,
          MultimodalOps.withWavPayload(s, Tables.load(s, d, "documents")))
        .orderBy("doc_id", "win_idx"),
      Some("""WITH dims AS (SELECT doc_id,
               64 + doc_id % 32 AS n FROM documents),
             sm AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM dims),
             v AS (SELECT doc_id, n, i, CAST(i // 16 AS INTEGER) AS win_idx,
               (doc_id*13 + i*11) % 4096 - 2048 AS v FROM sm),
             agg AS (SELECT doc_id, CAST(max(n) AS INTEGER) AS n_samples,
               win_idx,
               CAST(count(*) AS INTEGER) AS win_len,
               CAST(sum(v * v) AS BIGINT) AS sum_sq FROM v GROUP BY 1, 3)
             SELECT doc_id, CAST(8000 AS INTEGER) AS sample_rate,
               n_samples, win_idx, win_len, sum_sq,
               sqrt(CAST(sum_sq AS DOUBLE) / win_len) AS rms
             FROM agg ORDER BY doc_id, win_idx""")),

    // REAL multi-frame container decode via javax.imageio: each
    // document carries an ANIMATED GIF written by the JDK's own GIF
    // writer (2-5 full-size frames of a gray raster). The gray
    // fixture fits GIF's 256-entry palette exactly, so the LZW
    // round-trip is LOSSLESS and the oracle replays geometry, exact
    // per-frame gray means, and the per-frame aHash from the pixel
    // formula — m9's full-replay contract extended to a container
    // whose frame boundaries live in real image descriptors (unlike
    // the synthetic concatenated-P6 stream of m2/m6). The hashes feed
    // the unchanged m6 near-dup machinery (MultimodalSpec plants a
    // re-cut GIF and finds it via gifNearDups).
    Q("m11_decode_gif",
      (s, d) => MultimodalOps
        .gifFrameFeatures(s,
          MultimodalOps.withGifPayload(s, Tables.load(s, d, "documents")))
        .orderBy("doc_id", "frame_idx"),
      Some("""WITH dims AS (SELECT doc_id, 8 + doc_id % 9 AS w,
               8 + doc_id % 7 AS h, 2 + doc_id % 4 AS n_frames FROM documents),
             fr AS (SELECT doc_id, w, h, unnest(range(0, n_frames)) AS f FROM dims),
             px AS (SELECT doc_id, w, h, f, unnest(range(0, w * h)) AS p FROM fr),
             mv AS (SELECT doc_id, f, w, h,
               sum((doc_id*31 + f*17 + p*7) % 256) AS sv
               FROM px GROUP BY 1, 2, 3, 4),
             opx AS (SELECT doc_id, w, h, f, unnest(range(0, 64)) AS o FROM fr),
             mapped AS (SELECT doc_id, f, o,
               ((o // 8) * h // 8) * w + ((o % 8) * w // 8) AS src FROM opx),
             gray AS (SELECT doc_id, f, o,
               3 * ((doc_id*31 + f*17 + src*7) % 256) AS g FROM mapped),
             tot AS (SELECT doc_id, f, sum(g) AS sg FROM gray GROUP BY 1, 2),
             hsh AS (SELECT gray.doc_id, gray.f,
               CAST(sum(CASE WHEN g * 64 > sg THEN
                 (CASE WHEN o = 63 THEN -9223372036854775808
                       ELSE CAST(power(2, o) AS BIGINT) END)
                 ELSE 0 END) AS BIGINT) AS frame_hash
              FROM gray JOIN tot ON gray.doc_id = tot.doc_id AND gray.f = tot.f
              GROUP BY 1, 2)
             SELECT mv.doc_id, CAST(mv.f AS INTEGER) AS frame_idx,
               CAST(mv.w AS INTEGER) AS width, CAST(mv.h AS INTEGER) AS height,
               CAST(sv AS DOUBLE) / (mv.w * mv.h) AS mean_v, frame_hash
             FROM mv JOIN hsh ON mv.doc_id = hsh.doc_id AND mv.f = hsh.f
             ORDER BY mv.doc_id, frame_idx""")),

    // REAL big-endian AIFF decode via javax.sound — the
    // endianness-sensitive twin of m10: AIFF stores PCM big-endian
    // where RIFF/WAVE stores it little-endian, and the fixture's
    // sample values have distinct high/low bytes, so a byte-swap in
    // the decoder produces different samples and cannot hash-match.
    // Signed-PCM formula fully replayed, the m10 contract.
    Q("m12_decode_aiff",
      (s, d) => MultimodalOps
        .aiffFeatures(s,
          MultimodalOps.withAiffPayload(s, Tables.load(s, d, "documents")))
        .orderBy("doc_id", "win_idx"),
      Some("""WITH dims AS (SELECT doc_id,
               64 + doc_id % 32 AS n FROM documents),
             sm AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM dims),
             v AS (SELECT doc_id, n, i, CAST(i // 16 AS INTEGER) AS win_idx,
               (doc_id*19 + i*23) % 4096 - 2048 AS v FROM sm),
             agg AS (SELECT doc_id, CAST(max(n) AS INTEGER) AS n_samples,
               win_idx,
               CAST(count(*) AS INTEGER) AS win_len,
               CAST(sum(v * v) AS BIGINT) AS sum_sq FROM v GROUP BY 1, 3)
             SELECT doc_id, CAST(8000 AS INTEGER) AS sample_rate,
               n_samples, win_idx, win_len, sum_sq,
               sqrt(CAST(sum_sq AS DOUBLE) / win_len) AS rms
             FROM agg ORDER BY doc_id, win_idx"""))
  )
}
