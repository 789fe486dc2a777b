package graft

import org.apache.spark.sql.SparkSession

/** Decade-up measurement for the fourth-wave entries (e9/e10 over
  * events, t22/d14/x7/b8/d15 over documents) at sf0.1 and the
  * sf1-equivalent (`tools/gen_sfx.py`, 10×). Not a spec — run via
  * Test/runMain; PERF.md records the outcome.
  */
object WaveFourProbe {
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
      println(f"W4 $label time=${math.min(t1, t2)}%.2fs rows=$c1")
    }

    val names = Seq("e9_retention_cohorts", "e10_scd2_intervals",
      "t22_bpe_merge", "d14_cross_source_overlap", "x7_dsir_importance",
      "b8_diversified_topk", "d15_dup_pagerank",
      "e11_count_anomalies", "e12_transition_matrix",
      "d16_triangle_stats", "sp10_weighted_priority_sample",
      "b9_maxsim_topk", "x8_source_datacard", "b10_maxsim_served",
      "x9_release_manifest", "t23_vocab_growth", "e13_daily_top_users",
      "n11_knn_classify", "e14_rolling_active", "u4_intersect_all",
      "u5_except_all", "sp11_kfold_split", "e15_time_weighted_avg",
      "t24_langid_confusion", "t25_word_dropout", "e16_cooccurrence",
      "n12_label_centroids", "e17_gap_histogram", "t26_code_detect",
      "e18_decayed_ltv")
    // h3/h5/s13 are lineitem-shaped: no sf1-equivalent exists; they
    // ride the ordinary sf0.01→sf0.1 bench decade (R12bProbe note)
    Seq("/root/testdata/sf0.1", "/tmp/sfx1").foreach { dir =>
      if (new java.io.File(s"$dir/documents.parquet").exists())
        names.foreach(n => time(s"dir=$dir $n",
          SparkEntry.queries(n)(spark, dir)))
      else println(s"W4 dir=$dir SKIPPED (missing)")
    }
    spark.stop()
  }
}
