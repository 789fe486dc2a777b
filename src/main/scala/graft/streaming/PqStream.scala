package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}

import graft.operators.PqIndex

/** STREAMING PQ encoding over frozen codebooks — the online half of
  * `PqIndex` (the ClusterStream contract at the compression family):
  * codebooks are learned offline (`PqIndex.fit` — dims·k longs), the
  * stream replaces each arriving vector with its m codes + exact
  * reconstruction error. This is the shape of an ingest-time embedding
  * compactor: new vectors land already in the codes-only storage tier
  * that ADC search (n17/n18) prices without ever touching floats, so
  * the served index grows by appending code rows — no refit, no
  * re-encode of history.
  *
  * Per micro-batch the work is EXACTLY the batch operator — the same
  * single map-side projection of m inlined-literal argmins — so
  * stream/batch parity is bit-level: encoding is per-row pure and
  * chopping changes nothing. Codebooks are frozen at stream definition
  * (drift past tolerance → retrain → restart, the AnnStream
  * single-writer contract; x11's drift report is the monitor).
  *
  * Crash replay is idempotent via the `_batch_id` dynamic-overwrite
  * scheme; duplicate vec_ids within a batch collapse to one row
  * (at-least-once source; encoding is deterministic).
  */
object PqStream {

  /** `vecs`: streaming DataFrame of (vec_id, embedding). */
  def encode(vecs: DataFrame, books: Seq[Seq[Array[Long]]], outDir: String,
      checkpointDir: String, dims: Int = 64): DataStreamWriter[Row] =
    writeEncoded(vecs, outDir, checkpointDir,
      batch => PqIndex.encode(batch, books, dims))

  /** The IVF-PQ variant: frozen coarse centroids + frozen residual
    * codebooks — each arriving vector lands as (cell, codes, err2), the
    * row shape `IvfPq.search` prunes by cell (same frozen-model,
    * per-row-pure, replay-idempotent contract as `encode`).
    */
  def encodeIvf(vecs: DataFrame, cents: Seq[Array[Long]],
      books: Seq[Seq[Array[Long]]], outDir: String,
      checkpointDir: String, dims: Int = 64): DataStreamWriter[Row] =
    writeEncoded(vecs, outDir, checkpointDir,
      batch => graft.operators.IvfPq.encode(batch, cents, books, dims))

  private def writeEncoded(vecs: DataFrame, outDir: String,
      checkpointDir: String,
      enc: DataFrame => DataFrame): DataStreamWriter[Row] =
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        enc(batch.dropDuplicates("vec_id"))
          .withColumn("_batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("_batch_id").parquet(outDir)
        ()
      }
}
