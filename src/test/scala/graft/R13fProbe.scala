package graft

import org.apache.spark.sql.SparkSession

/** Decade-up measurement for the round-13 sixth wave: filtered vector
  * search (embeddings+documents decade sf0.1 → /tmp/sfx1), exact
  * median (lineitem decade sf0.01 → sf0.1), attribution (events decade
  * sf0.1 → /tmp/sfx1). Not a spec — run via Test/runMain; PERF.md
  * records the outcome.
  */
object R13fProbe {
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
      println(f"R13f $label time=${math.min(t1, t2)}%.2fs rows=$c1")
    }

    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { dir =>
      Seq("a12_exact_median", "h7_volume_shipping", "h15_top_supplier",
        "w3_ntile_quartiles", "h13_customer_distribution",
        "h17_small_quantity_revenue", "h8_market_share",
        "h19_discounted_revenue").foreach(n =>
        time(s"dir=$dir $n", SparkEntry.queries(n)(spark, dir)))
    }
    Seq("/root/testdata/sf0.1", "/tmp/sfx1").foreach { dir =>
      if (new java.io.File(s"$dir/documents.parquet").exists()) {
        Seq("n21_filtered_knn", "n22_filtered_ivfpq",
          "e19_last_touch_attribution", "d18_kcore",
          "d19_personalized_pagerank", "sp14_budget_waterfill").foreach(n =>
          time(s"dir=$dir $n", SparkEntry.queries(n)(spark, dir)))
      } else println(s"R13f dir=$dir SKIPPED (missing)")
    }
    spark.stop()
  }
}
