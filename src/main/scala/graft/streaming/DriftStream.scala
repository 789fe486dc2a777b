package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** CONTINUOUS DRIFT MONITORING — the streaming face of the x11 release
  * drift report: a frozen per-source baseline histogram (fitted once
  * from the reference corpus) is compared, at read time, against the
  * live per-source histogram the stream maintains, with the same
  * e6-fixed-point L1 arithmetic as the batch entry.
  *
  * Composition over new machinery: the live histogram IS
  * `SketchStream.histStreamBy` — the grouped partial-partition machine
  * (additive partials in `_batch_id` partitions, replay overwrites
  * itself, compaction folds, single-scan grouped read) — so this file
  * adds ZERO new cell logic. What it adds is the read-side reconcile:
  * normalize both sides per source, full-outer join on (source,
  * bucket), fold to one L1 row per source, and an alarm face that
  * thresholds it. State: ≤64 buckets × sources on each side.
  *
  * The baseline is deliberately a STATIC snapshot (the x10/x11 release
  * discipline): drift is measured against what was shipped, not against
  * a moving average that would absorb the very shift being monitored.
  * Refit = rewrite `baselineDir` atomically; the next report reads it
  * (the DsirStream refit contract).
  */
object DriftStream {

  /** Persist the frozen baseline: per-source log2 doc-length histogram,
    * ≤64 rows per source — governance-table sized. Uses the SAME length
    * expression as `histStreamBy` so the two sides bucket identically.
    */
  def fitBaseline(docs: DataFrame, baselineDir: String,
      keyCol: String = "source", textCol: String = "text"): Unit = {
    Sketches.logHistogramBy(
        docs.selectExpr(s"$keyCol AS g",
          s"CAST(size(split($textCol, ' ')) AS BIGINT) AS v"),
        Seq("g"))
      .coalesce(1)
      .write.mode("overwrite").parquet(baselineDir)
    ()
  }

  /** Normalize a (g, bucket, cnt) histogram to e6 proportions.
    * Headroom: cnt ≤ total, so cnt·10⁶ stays in BIGINT while a source
    * holds < 9.2·10¹² docs — past that, use sp12's decomposition.
    */
  private def norm(h: DataFrame, tag: String): DataFrame =
    h.join(h.groupBy("g").agg(sum("cnt").as("total")), Seq("g"))
      .select(col("g"), col("bucket"),
        expr("(cnt * 1000000L) div total").as(s"p$tag"),
        col("cnt").as(s"cnt$tag"))

  /** Per-source drift of the live stream store vs the frozen baseline:
    * (source, n_base, n_live, l1_e6, n_buckets_drifted) — x11's exact
    * arithmetic over the merged single-scan grouped read.
    */
  def driftReport(spark: SparkSession, storeDir: String,
      baselineDir: String): DataFrame = {
    val base = norm(spark.read.parquet(baselineDir), "1")
      .withColumnRenamed("g", "g_a").withColumnRenamed("bucket", "b_a")
    val live = norm(SketchStream.mergedHistogramBy(spark, storeDir), "2")
      .withColumnRenamed("g", "g_b").withColumnRenamed("bucket", "b_b")
    base.join(live, col("g_a") === col("g_b") && col("b_a") === col("b_b"),
        "full_outer")
      .select(coalesce(col("g_a"), col("g_b")).as("source"),
        coalesce(col("p1"), lit(0L)).as("p1"),
        coalesce(col("p2"), lit(0L)).as("p2"),
        coalesce(col("cnt1"), lit(0L)).as("cnt1"),
        coalesce(col("cnt2"), lit(0L)).as("cnt2"))
      .groupBy("source")
      .agg(sum("cnt1").as("n_base"), sum("cnt2").as("n_live"),
        sum(abs(col("p1") - col("p2"))).as("l1_e6"),
        sum(when(col("p1") =!= col("p2"), 1L).otherwise(0L))
          .as("n_buckets_drifted"))
  }

  /** The alarm face: sources whose live profile moved more than
    * `maxL1E6` from the shipped baseline (1e6 = total mass moved).
    * Sources present on only one side drift by construction (their
    * whole mass is unmatched) and alarm at any threshold < 2e6.
    */
  def alarms(spark: SparkSession, storeDir: String, baselineDir: String,
      maxL1E6: Long): DataFrame =
    driftReport(spark, storeDir, baselineDir)
      .filter(col("l1_e6") > maxL1E6)
      .orderBy("source")
}
