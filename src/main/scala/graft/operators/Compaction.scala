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
  * table rewrite: the reader is handed the hot partition paths directly
  * (with `basePath` preserving the partition column), so cold
  * partitions are never read, never rewritten, and never even
  * file-listed — discovery walks only the hot directories plus the one
  * top-level status listing the threshold check itself performs (the
  * spec pins cold files' mtimes). Hot partitions are rewritten through
  * dynamic partition overwrite into one file per partition
  * (`repartition` on the partition column: each value hashes to exactly
  * one task).
  *
  * CRASH WINDOW (r10 advice): dynamic partition overwrite stages the
  * new files, then commits by DELETING each target partition and
  * RENAMING the staged one in — concurrent, not atomic. A crash inside
  * that commit window can leave a hot partition's only copy under the
  * job's hidden staging directory (`.spark-staging-<jobId>/` beneath
  * `dir`) — and unlike the streaming sinks, compaction CANNOT
  * regenerate the data by replay; the staged files are then the data.
  * Recovery after a mid-commit crash: inspect `dir` for
  * `.spark-staging-*` remnants and move the staged partition
  * directories into place (or restore the partition from the source
  * that fed the sink) BEFORE trusting reads or re-running compaction.
  * Readers during a normal run are safe (they see old files until the
  * swap); the exposure is a writer crash mid-commit, the same window a
  * Hive dynamic-overwrite carries. A transactional table format closes
  * it at 100 TB; this layout trades that for plain-parquet operability
  * and documents the step instead.
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
    // read ONLY the hot partition directories — basePath keeps the
    // partition column in the schema; cold partitions are not even
    // file-listed (r10 advice: a whole-directory read would run full
    // partition discovery over every cold partition before pruning)
    val rows = spark.read.option("basePath", dir)
      .parquet(hot.map(v => s"$dir/$partitionCol=$v"): _*)
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
