package graft

import org.apache.spark.sql.SparkSession

/** Decade-up measurement for the round-12 second-wave entries — the
  * relational-breadth additions ride the ordinary sf0.01→sf0.1 bench
  * decade (lineitem/orders have no sf1-equivalent), so this probe
  * covers the documents/embeddings/events entries at sf0.1 and the
  * sf1-equivalent (`tools/gen_sfx.py`, 10×): w1 window family, t18/t19
  * text preprocessing, t20 grouped HLL, sp7 shuffle shards, sp8
  * cluster split, d12 paragraph dedup, x6 repetition gate, n9 SQ-ADC.
  * Not a spec — run via Test/runMain; PERF.md records the outcome.
  */
object R12bProbe {
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
      println(f"R12b $label time=${math.min(t1, t2)}%.2fs rows=$c1")
    }

    val names = Seq("w1_window_running", "t18_normalize_text",
      "t19_bpe_pretokenize", "t20_source_distinct_sketch",
      "sp7_shuffle_shards", "sp8_cluster_split", "d12_paragraph_dedup",
      "x6_repetition_gate", "n9_sq_adc_topk",
      "n10_sq_adc_served", "d13_winnow_pairs", "t17_winnowing",
      "e8_funnel", "t21_cdc_chunks")
    Seq("/root/testdata/sf0.1", "/tmp/sfx1").foreach { dir =>
      if (new java.io.File(s"$dir/documents.parquet").exists())
        names.foreach(n => time(s"dir=$dir $n",
          SparkEntry.queries(n)(spark, dir)))
      else println(s"R12b dir=$dir SKIPPED (missing)")
    }
    spark.stop()
  }
}
