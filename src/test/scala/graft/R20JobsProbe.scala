package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** r20: per-JOB wall-clock breakdown of an entry's steady-state
  * execution (job id, duration, first stage name) — separates stage
  * compute from scheduling gaps. Test/runMain <entry...>.
  */
object R20JobsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    var collecting = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .map(_.getProperty("spark.job.description", "")).getOrElse("")
        starts.put(js.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = starts.remove(je.jobId)
        if (collecting && s != null)
          lines.add(f"R20JOB   job=${je.jobId}%4d ${(System.nanoTime() - s._1) / 1e9}%7.3f s  ${s._2.take(90)}")
      }
    })
    val qs = SparkEntry.queries
    args.foreach { name =>
      val fn = qs(name)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warm
      fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warm2
      collecting = true
      spark.sparkContext.setJobDescription(s"$name steady")
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      collecting = false
      Thread.sleep(300)
      println(s"R20JOB $name build=${(t1 - t0) / 1e9} exec=${(t2 - t1) / 1e9}")
      lines.forEach(l => println(l))
      lines.clear()
    }
    spark.stop()
  }
}
