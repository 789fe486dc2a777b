package graft
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    for (name <- args) {
      println(s"===== $name =====")
      val df = SparkEntry.queries(name)(spark, d)
      val plan = df.queryExecution.executedPlan.toString
      def count(s: String) = s.r.findAllIn(plan).size
      println(s"BroadcastHashJoin=${count("BroadcastHashJoin")} SortMergeJoin=${count("SortMergeJoin")} ShuffleExchange=${count("Exchange (?:hash|range)partitioning")} ReusedExchange=${count("ReusedExchange")} Scans=${count("Scan parquet|Scan ExistingRDD")} BNLJ=${count("BroadcastNestedLoopJoin")} Cartesian=${count("CartesianProduct")} WSCG=${count("\\*\\([0-9]+\\)")}")
      val pushed = "PushedFilters: \\[[^\\]]+\\]".r.findAllIn(plan).toSet
      println(pushed.take(4).mkString("\n"))
      // execute, then re-read the AQE FINAL plan (runtime stage reuse is
      // invisible in the pre-execution snapshot)
      df.collect()
      val fin = df.queryExecution.executedPlan.toString
      def fcount(s: String) = s.r.findAllIn(fin).size
      println(s"FINAL: isFinalPlan=${fin.contains("isFinalPlan=true")} ShuffleStages=${fcount("ShuffleQueryStage")} ReusedStages=${fcount("ReusedQueryStage|reuses")} ReusedExchange=${fcount("ReusedExchange")} WSCG=${fcount("\\*\\([0-9]+\\)")}")
    }
    spark.stop()
  }
}
