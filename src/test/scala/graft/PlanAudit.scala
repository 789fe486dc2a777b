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
      println(s"BroadcastHashJoin=${count("BroadcastHashJoin")} SortMergeJoin=${count("SortMergeJoin")} ShuffleExchange=${count("Exchange (?:hash|range)partitioning")} BNLJ=${count("BroadcastNestedLoopJoin")} Cartesian=${count("CartesianProduct")} WSCG=${count("\\*\\([0-9]+\\)")}")
      val pushed = "PushedFilters: \\[[^\\]]+\\]".r.findAllIn(plan).toSet
      println(pushed.take(4).mkString("\n"))
    }
    spark.stop()
  }
}
