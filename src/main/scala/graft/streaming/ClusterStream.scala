package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}

import graft.operators.KMeans

/** STREAMING cluster assignment over a frozen k-means fit — the online
  * half of `KMeans` (the AnnStream contract at the clustering family):
  * centroids are learned offline (`KMeans.fit` — k·dims longs), the
  * stream routes each arriving vector to its region. This is the shape
  * of an ingest-time corpus router: new documents' embeddings land
  * already stamped with the content region the curation pipeline
  * clusters by (n15's coreset, region quotas, per-region gates).
  *
  * Per micro-batch the work is EXACTLY the batch operator — the same
  * map-side integer argmin against the same inlined centroid literal —
  * so stream/batch parity is bit-level, not approximate: chopping the
  * input into any number of batches changes nothing because assignment
  * is per-row pure. The centroids are frozen at stream definition
  * (retrain → restart, the AnnStream single-writer contract).
  *
  * Crash replay is idempotent: the `_batch_id` dynamic-overwrite
  * scheme (`Pipeline.applyBatch`) — a replayed batch overwrites its own
  * partition. Duplicate vec_ids within a batch collapse to one row
  * (at-least-once source contract; assignment is deterministic so the
  * duplicates would have carried identical values anyway).
  */
object ClusterStream {

  /** `vecs`: streaming DataFrame of (vec_id, embedding). */
  def route(vecs: DataFrame, cents: Seq[Array[Long]], outDir: String,
      checkpointDir: String): DataStreamWriter[Row] =
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        KMeans.assign(KMeans.quantized(batch.dropDuplicates("vec_id")), cents)
          .withColumn("_batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("_batch_id").parquet(outDir)
        ()
      }
}
