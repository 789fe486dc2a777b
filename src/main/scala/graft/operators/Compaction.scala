package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-file compaction for append-mode partitioned parquet sinks.
  *
  * Every continuously-appending layout in this library — the streaming
  * dedup indexes (`DocStream`/`EmbedStream`, one file per touched bucket
  * per micro-batch), the streaming dedup sink (`EventStream`), an IVF
  * index grown by `IvfIndex.appendToSaved` — accretes files per
  * partition over time. At 100 TB that is the classic operational
  * failure mode: listing cost and per-file open overhead grow linearly
  * with batch count until reads are dominated by metadata, not data.
  *
  * `compact` rewrites ONLY the partitions whose data-file count exceeds
  * `maxFiles` — a threshold-gated, incremental maintenance pass, not a
  * table rewrite: cold partitions are never read, never listed beyond a
  * directory status call, and never touched (the spec pins their file
  * mtimes). Hot partitions are rewritten through dynamic partition
  * overwrite — Spark stages the rewrite and swaps at commit, so a
  * reader never sees a partially-compacted partition — into one file
  * per partition (`repartition` on the partition column: each value
  * hashes to exactly one task).
  *
  * `dropExactDuplicates` additionally collapses byte-identical rows —
  * the documented healing pass for a crash-REPLAYED streaming index
  * append (`DocStream`: "a replayed index append can duplicate entries,
  * which is harmless ... a periodic compaction can drop exact-duplicate
  * rows").
  *
  * Single-writer contract (same as every sink here): run compaction when
  * no writer is appending to the affected partitions — a concurrent
  * append into a partition being rewritten would be silently dropped by
  * the overwrite-at-commit.
  */
object Compaction {

  /** Partition subdirectories of `dir` (layout `col=value`) with more
    * than `maxFiles` data files: (value string, file count).
    */
  private[graft] def hotPartitions(spark: SparkSession, dir: String,
      partitionCol: String, maxFiles: Int): Seq[(String, Int)] = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return Seq.empty
    fs.listStatus(path).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(partitionCol + "="))
      .map { s =>
        val n = fs.listStatus(s.getPath)
          .count(f => f.isFile && f.getPath.getName.startsWith("part-"))
        (s.getPath.getName.stripPrefix(partitionCol + "="), n)
      }
      .filter(_._2 > maxFiles)
  }

  /** Compact the hot partitions of one partitioned parquet directory.
    * Returns the partition values rewritten (empty = nothing exceeded
    * the threshold — the call cost one directory listing, zero jobs).
    */
  def compact(spark: SparkSession, dir: String, partitionCol: String,
      maxFiles: Int = 4, dropExactDuplicates: Boolean = false): Seq[String] = {
    val hot = hotPartitions(spark, dir, partitionCol, maxFiles).map(_._1)
    if (hot.isEmpty) return Seq.empty
    // partition values arrive as directory-name strings; comparing
    // against the column CAST TO STRING works for the numeric partition
    // keys every sink here uses, without this code needing to know the
    // concrete type
    val rows = spark.read.parquet(dir)
      .filter(col(partitionCol).cast("string").isin(hot: _*))
    val deduped = if (dropExactDuplicates) rows.distinct() else rows
    deduped
      .repartition(col(partitionCol))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(dir)
    hot
  }

  /** Compact a persisted IVF index grown by `IvfIndex.appendToSaved`:
    * the cell-partitioned assignment and the id-bucketed pointer store,
    * each under its own threshold check.
    */
  def compactIvf(spark: SparkSession, dir: String,
      maxFiles: Int = 4): Seq[String] =
    compact(spark, s"$dir/assigned", "cell", maxFiles) ++
      compact(spark, s"$dir/by_id", "_idb", maxFiles).map("by_id:" + _)
}
