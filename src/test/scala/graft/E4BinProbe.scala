package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement driver for the range-join bin-width hint (kept in
  * src/test with the other diagnostics): times e4's join at several bin
  * widths on SPARK_GRAFT_SF_DIR. Not a spec — run via Test/runMain.
  */
object E4BinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = Tables.load(spark, sfDir, "events")
    val points = ev.select(col("event_id"), col("ts"))
    val intervals = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("w_id"), col("ts").as("start_ts"),
        expr("timestamp_micros(unix_micros(ts) + cast(floor(value * 60000) as bigint) * 1000)")
          .as("end_ts"))
    val maxUs = 100L * 60 * 1000 * 1000 // value<100 min windows
    Seq(0L, maxUs / 2, maxUs / 4, maxUs / 8, maxUs / 16).foreach { hint =>
      // warm + 2 timed reps, min
      def once(): Double = {
        val t0 = System.nanoTime()
        graft.operators.RangeJoin.pointsInIntervals(points, "event_id", "ts",
            intervals, "w_id", "start_ts", "end_ts", binHintUs = hint)
          .groupBy("w_id").agg(count(lit(1)).as("n_points"))
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val t = math.min(once(), once())
      println(f"BIN hint=${hint}us time=$t%.2fs")
    }
    spark.stop()
  }
}
