package graft

import org.apache.spark.sql.SparkSession

/** Decade-up measurement for the entries VERDICT r11 #7 lists as
  * unprobed — the composed corpus pipeline detail/gate/canonical faces
  * (x2-x4), passage retrieval (b6), the hashed-embedding pair
  * (t13/n8) — plus this round's additions (m10 WAV decode, d11
  * semantic dedup, t14 quantile sketch), at sf0.1 and the
  * sf1-equivalent (`tools/gen_sfx.py`, 10× documents). Not a spec —
  * run via Test/runMain; PERF.md records the outcome.
  */
object R12Probe {
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
      println(f"R12 $label time=${math.min(t1, t2)}%.2fs rows=$c1")
    }

    val names = Seq("x2_corpus_pipeline_detail", "x3_quality_quantile_gate",
      "x4_canonical_selection", "b6_passage_topk", "t13_hashed_embedding",
      "n8_hashed_embedding_knn", "m10_decode_wav", "d11_semantic_dedup",
      "t14_quantile_sketch")
    Seq("/root/testdata/sf0.1", "/tmp/sfx1").foreach { dir =>
      if (new java.io.File(s"$dir/documents.parquet").exists())
        names.foreach(n => time(s"dir=$dir $n",
          SparkEntry.queries(n)(spark, dir)))
      else println(s"R12 dir=$dir SKIPPED (missing)")
    }
    spark.stop()
  }
}
