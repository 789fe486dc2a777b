package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.EventStream

/** One-off measurement driver comparing the three sessionization faces
  * (window-function e2, native session_window e2b, FMGS) at sf0.1 and
  * the sf1-equivalent — the PERF.md "which wins at sf1" note for the
  * r10 verdict's session-window twin. Not a spec — run via Test/runMain.
  */
object SessionProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("/root/testdata/sf0.1", "/tmp/sfx1").foreach { dir =>
      val events = Tables.load(spark, dir, "events")
      def time(label: String, f: => org.apache.spark.sql.DataFrame): Unit = {
        def once(): Double = {
          val t0 = System.nanoTime()
          f.write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        once()
        val t = math.min(once(), once())
        println(f"SESSION dir=$dir $label time=$t%.2fs")
      }
      time("e2_window_fn", EventStream.sessionizeBatch(events, 60))
      time("e2b_native", EventStream.sessionizeNative(events, 60))
      time("fmgs", EventStream.sessionize(spark, events, 60).toDF)
    }
    spark.stop()
  }
}
