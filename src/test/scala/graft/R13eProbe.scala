package graft

import org.apache.spark.sql.SparkSession

/** Decade-up measurement for the round-13 fifth wave: the TPC-H
  * additions (lineitem decade sf0.01 → sf0.1), the PQ / IVF-PQ family
  * and the temporal split (embeddings/events decade sf0.1 →
  * /tmp/sfx1). The PQ fits are timed separately (the entries share a
  * cached fit by contract, the R13cProbe protocol). Not a spec — run
  * via Test/runMain; PERF.md records the outcome.
  */
object R13eProbe {
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
      println(f"R13e $label time=${math.min(t1, t2)}%.2fs rows=$c1")
    }

    val hNames = Seq("h1_pricing_summary", "h4_priority_returns",
      "h14_promo_revenue", "h21_sole_blame", "h22_idle_rich")
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { dir =>
      hNames.foreach(n => time(s"dir=$dir $n", SparkEntry.queries(n)(spark, dir)))
    }

    val nNames = Seq("n16_pq_encode", "n17_pq_adc_topk",
      "n19_ivfpq_encode", "n20_ivfpq_topk")
    Seq("/root/testdata/sf0.1", "/tmp/sfx1").foreach { dir =>
      if (new java.io.File(s"$dir/embeddings.parquet").exists()) {
        // fit cost, timed alone (cached for the entries below)
        val emb = Tables.load(spark, dir, "embeddings")
        val t0 = System.nanoTime()
        val cents = graft.operators.KMeans.fit(emb, 8, 3)
        val books = graft.operators.PqIndex.fit(emb, 4, 4, 2)
        val rbooks = graft.operators.IvfPq.fit(emb, cents, 4, 4, 2)
        println(f"R13e dir=$dir pq+ivfpq_fit time=${(System.nanoTime() - t0) / 1e9}%.2fs" +
          s" (flat ${books.length} books, residual ${rbooks.length})")
        nNames.foreach(n => time(s"dir=$dir $n", SparkEntry.queries(n)(spark, dir)))
        time(s"dir=$dir sp13_temporal_split",
          SparkEntry.queries("sp13_temporal_split")(spark, dir))
      } else println(s"R13e dir=$dir SKIPPED (missing)")
    }
    spark.stop()
  }
}
