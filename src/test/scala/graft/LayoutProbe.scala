package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Measurement driver for Layout pruning at data scale: rows the
  * parquet reader surfaces (post stats-skipping) for the same selective
  * filters over round-robin, linear-clustered, and Z-ordered layouts of
  * the events table. Run via Test/runMain with SPARK_GRAFT_SF_DIR.
  */
object LayoutProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Layout
    val events = Tables.load(spark, sfDir, "events")
      .select("event_id", "user_id", "value")
    val n = events.count()
    val base = java.nio.file.Files.createTempDirectory("graft_layp").toString
    events.repartition(16).write.mode("overwrite").parquet(s"$base/flat")
    Layout.writeClustered(events, s"$base/lin", 16, "user_id")
    Layout.writeZOrdered(events, s"$base/z", 16, "user_id", "value")

    def scanRows(df: DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collectLeaves()
        .collect { case s: FileSourceScanExec => s.metrics("numOutputRows").value }
        .sum
    }
    def measure(name: String, f: String => DataFrame): Unit = {
      val r = Seq("flat", "lin", "z")
        .map(l => f(s"$base/$l")).map(scanRows)
      println(f"LAYOUT $name n=$n flat=${r(0)} linear=${r(1)} z=${r(2)}")
    }
    measure("user_eq", d => spark.read.parquet(d).filter(col("user_id") === 42L))
    measure("user_band", d => spark.read.parquet(d)
      .filter(col("user_id").between(40L, 49L)))
    measure("value_band", d => spark.read.parquet(d)
      .filter(col("value").between(40.0, 65.0)))
    spark.stop()
  }
}
