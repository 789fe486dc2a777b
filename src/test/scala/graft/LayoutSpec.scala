package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout

/** Layout clustering must turn selective filters into row-group skips:
  * the scan's output row count (rows surviving parquet's pushed-down
  * stats filtering) is the observable — identical query, identical
  * results, different bytes touched.
  */
class LayoutSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  /** Rows the parquet reader actually surfaced (post row-group-stats
    * skipping, pre Spark-side Filter).
    */
  private def scanRows(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collectLeaves()
      .collect { case s: FileSourceScanExec => s.metrics("numOutputRows").value }
      .sum
  }

  private lazy val events = Tables.load(spark, sf, "events")
    .select("event_id", "user_id", "value")

  test("clustered layout prunes a selective equality filter; results identical") {
    val flat = tmp("graft_lay_flat"); val clus = tmp("graft_lay_clus")
    // same data, same file count — round-robin vs range+sort
    events.repartition(8).write.mode("overwrite").parquet(flat)
    Layout.writeClustered(events, clus, 8, "user_id")

    def q(dir: String) = spark.read.parquet(dir).filter(col("user_id") === 42L)
    val expected = q(flat).collect().map(_.getLong(0)).sorted.toSeq
    assert(q(clus).collect().map(_.getLong(0)).sorted.toSeq === expected)
    assert(expected.nonEmpty)

    val flatRows = scanRows(q(flat))
    val clusRows = scanRows(q(clus))
    // flat: every file's [min,max] admits user 42 → no skips, full scan.
    // clustered: only the one file owning user 42's range surfaces rows.
    assert(flatRows >= events.count() * 9 / 10,
      s"flat layout unexpectedly pruned ($flatRows)")
    assert(clusRows * 4 <= flatRows,
      s"clustered layout did not prune: $clusRows vs $flatRows")
  }

  test("Z-order prunes on BOTH dimensions; linear clustering only on its leading one") {
    val linear = tmp("graft_lay_lin"); val zdir = tmp("graft_lay_z")
    Layout.writeClustered(events, linear, 16, "user_id")
    Layout.writeZOrdered(events, zdir, 16, "user_id", "value")

    def onUser(dir: String) = spark.read.parquet(dir)
      .filter(col("user_id").between(40L, 49L))
    // value is right-skewed; this band sits in quantile ~0.55-0.73, so
    // equal-frequency rectangles keep it inside one high-order stripe
    def onValue(dir: String) = spark.read.parquet(dir)
      .filter(col("value").between(40.0, 65.0))

    // identical results either layout, both dimensions (_zp is the
    // z-layout's bookkeeping partition column; content-irrelevant)
    assert(onUser(zdir).drop("_zp").collect().map(_.getLong(0)).sorted.toSeq
      === onUser(linear).collect().map(_.getLong(0)).sorted.toSeq)
    assert(onValue(zdir).drop("_zp").collect().map(_.getLong(0)).sorted.toSeq
      === onValue(linear).collect().map(_.getLong(0)).sorted.toSeq)

    val total = events.count()
    // leading column: both layouts prune
    assert(scanRows(onUser(linear)) * 2 <= total)
    assert(scanRows(onUser(zdir)) * 2 <= total)
    // second column: the linear layout is blind (value is unordered
    // within every user-range file) — Z-order still skips rectangles
    val linValue = scanRows(onValue(linear))
    val zValue = scanRows(onValue(zdir))
    assert(linValue >= total * 9 / 10,
      s"linear layout unexpectedly pruned on value ($linValue)")
    assert(zValue * 2 <= linValue,
      s"Z-order did not prune on the second dimension: $zValue vs $linValue")
  }
}
