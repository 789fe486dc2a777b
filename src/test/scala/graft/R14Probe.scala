package graft

import org.apache.spark.sql.SparkSession

/** Decade-up measurement for the round-14 additions and the three
  * r13-wave entries the PERF.md table missed: rank family (w2),
  * constraint gate (a11), gram novelty (t31) one decade up on their
  * native tables, and the new IVF-PQ re-rank (n23), packed assignment
  * (n24), byte-level BPE (t32) on the sfx1 decade (documents /
  * embeddings / events at 10× sf0.1 — tools/gen_sfx.py). Not a spec —
  * run via Test/runMain; PERF.md records the outcome.
  */
object R14Probe {
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
      println(f"R14 $label time=${math.min(t1, t2)}%.2fs rows=$c1")
    }

    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { dir =>
      Seq("w2_window_ranks", "a11_constraint_gate", "t31_gram_novelty")
        .foreach(n => time(s"dir=$dir $n", SparkEntry.queries(n)(spark, dir)))
    }
    Seq("/root/testdata/sf0.1", "/tmp/sfx1").foreach { dir =>
      if (new java.io.File(s"$dir/documents.parquet").exists()) {
        Seq("n23_ivfpq_rerank", "n24_kmeans_assign_packed",
          "t32_bpe_byte_train").foreach(n =>
          time(s"dir=$dir $n", SparkEntry.queries(n)(spark, dir)))
      } else println(s"R14 dir=$dir SKIPPED (missing)")
    }
    spark.stop()
  }
}
