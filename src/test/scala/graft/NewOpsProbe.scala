package graft

import org.apache.spark.sql.SparkSession

/** Decade-up measurement for the round-11 entries — repetition metrics
  * (t8), corpus stats (t9), token-budget quota (sp6), and the
  * substring cut list + rewrite (d10/d10b) — at sf0.1 and the
  * sf1-equivalent (`tools/gen_sfx.py`). The per-doc passes (t8/t9/sp6)
  * should scale ~linearly (wall ≈ flat at this size, the corpus is far
  * below the host's parallelism ceiling); the gram-keyed substring ops
  * carry an inverted-index join whose decade ratio is the honest
  * scale claim. Not a spec — run via Test/runMain; PERF.md records the
  * outcome.
  */
object NewOpsProbe {
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
      println(f"NEWOPS $label time=${math.min(t1, t2)}%.2fs rows=$c1")
    }

    val names = Seq("t8_repetition", "t9_corpus_stats", "sp6_token_budget",
      "d10_duplicate_spans", "d10b_dedup_rewrite")
    Seq("/root/testdata/sf0.1", "/tmp/sfx1").foreach { dir =>
      if (new java.io.File(s"$dir/documents.parquet").exists())
        names.foreach(n => time(s"dir=$dir $n",
          SparkEntry.queries(n)(spark, dir)))
      else println(s"NEWOPS dir=$dir SKIPPED (missing)")
    }
    spark.stop()
  }
}
