package graft

import org.apache.spark.sql.SparkSession

/** Decade-up measurement for the round-12 entries — BM25 ad-hoc (b3),
  * BM25 served (b4, includes one index build on first touch), RRF
  * fusion (b5), model inference (t12), and the composed pipeline (x1) —
  * at sf0.1 and the sf1-equivalent (`tools/gen_sfx.py`). b3/t12/x1 are
  * token-explode + doc-keyed partial-agg shapes (expect ~linear); b4's
  * serve cost is bounded by the query terms' posting lists, so its
  * decade ratio is the honest test of the pruned-read claim. Not a
  * spec — run via Test/runMain; PERF.md records the outcome.
  */
object RetrievalProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
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
      println(f"RETR $label time=${math.min(t1, t2)}%.2fs rows=$c1")
    }

    val names = Seq("b3_bm25_topk", "b4_bm25_served", "b5_rrf_fusion",
      "t12_model_quality", "x1_corpus_pipeline")
    Seq("/root/testdata/sf0.1", "/tmp/sfx1").foreach { dir =>
      if (new java.io.File(s"$dir/documents.parquet").exists())
        names.foreach(n => time(s"dir=$dir $n",
          SparkEntry.queries(n)(spark, dir)))
      else println(s"RETR dir=$dir SKIPPED (missing)")
    }
    spark.stop()
  }
}
