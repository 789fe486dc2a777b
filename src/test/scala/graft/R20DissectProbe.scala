package graft

import org.apache.spark.sql.SparkSession

/** r20: split an entry's steady-state wall into (plan build+analyze+
  * optimize+physical-plan) vs (execution), and report expression-tree
  * size — distinguishes Catalyst/codegen overhead from real compute on
  * the tiny-SF bench. Test/runMain; results land in OPTIMIZATION_r20.md.
  */
object R20DissectProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = SparkEntry.queries
    args.foreach { name =>
      val fn = qs(name)
      // warm (fills + codegen)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        val plan = df.queryExecution.executedPlan // force analysis+optimization+planning
        val nNodes = plan.collect { case p => p }.size
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        println(f"R20DIS $name%-28s rep$i build=${(t1 - t0) / 1e9}%6.3f plan=${(t2 - t1) / 1e9}%6.3f exec=${(t3 - t2) / 1e9}%6.3f physNodes=$nNodes")
      }
    }
    spark.stop()
  }
}
