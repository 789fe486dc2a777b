package graft

import org.apache.spark.sql.SparkSession

/** Decade-up measurement for the round-13 third wave (documents decade
  * sf0.1 → sf1-equivalent): domain reweighting, sketch overlap, drift
  * report, incremental dedup. Not a spec — run via Test/runMain;
  * PERF.md records the outcome.
  */
object R13dProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String, f: => org.apache.spark.sql.DataFrame): Unit = {
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val c = f.count()
        ((System.nanoTime() - t0) / 1e9, c)
      }
      once()
      val (t1, c1) = once()
      val (t2, _) = once()
      println(f"R13d $label time=${math.min(t1, t2)}%.2fs rows=$c1")
    }

    val names = Seq("sp12_domain_reweight", "t30_sketch_overlap",
      "x11_drift_report", "d17_incremental_dedup")
    Seq("/root/testdata/sf0.1", "/tmp/sfx1").foreach { dir =>
      if (new java.io.File(s"$dir/documents.parquet").exists())
        names.foreach(n => time(s"dir=$dir $n",
          SparkEntry.queries(n)(spark, dir)))
      else println(s"R13d dir=$dir SKIPPED (missing)")
    }
    spark.stop()
  }
}
