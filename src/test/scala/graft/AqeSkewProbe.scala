package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** AQE skew-join measurement — the automatic half of the skew story
  * next to the manual salting family (e6/e7): Spark's adaptive
  * execution splits an oversized shuffle partition at runtime, so a
  * BATCH join with a hot key needs no salting at all; the manual
  * hot-key salting operators exist for the cases AQE cannot cover
  * (structured-streaming stateful joins disable AQE, and pre-planned
  * bucketed layouts skip the exchange AQE would rewrite). Not a spec —
  * run via Test/runMain; PERF.md records the outcome.
  */
object AqeSkewProbe {
  def main(args: Array[String]): Unit = {
    def run(aqeSkew: Boolean): Double = {
      val spark = SparkSession.builder().master("local[8]")
        .appName(s"aqe_skew_$aqeSkew")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", aqeSkew.toString)
        .config("spark.sql.adaptive.skewJoin.enabled", aqeSkew.toString)
        .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      // 16M-row left, 95% on key 0 (the hot key), payload wide enough
      // that the hot partition crosses the skew threshold; right side
      // is a 1,000-key dim FORCED to shuffle (no broadcast) so the
      // skewed exchange actually exists
      val left = spark.range(0, 16000000L)
        .select(
          when(col("id") % 20 === 0, (col("id") % 1000) + 1).otherwise(0L).as("k"),
          concat(lit("payload-payload-payload-payload-payload-payload-"),
            col("id")).as("v"))
      val right = spark.range(0, 1000L)
        .select(col("id").as("k"), md5(col("id").cast("string")).as("rv"))
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val t0 = System.nanoTime()
      val n = left.join(right, "k")
        .select(length(col("v")) + length(col("rv")))
        .agg(sum(col("(length(v) + length(rv))"))).collect()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.stop()
      dt
    }
    // interleave to cancel machine drift; report mins
    val offs = Seq(run(false), run(false))
    val ons = Seq(run(true), run(true))
    println(f"AqeSkew skewJoin=off min=${offs.min}%.2fs skewJoin=on min=${ons.min}%.2fs")
  }
}
