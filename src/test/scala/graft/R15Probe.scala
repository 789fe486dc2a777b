package graft

import org.apache.spark.sql.SparkSession

/** Round-15 measurement driver. Sections (select by arg, default all):
  *   - `d11`: the derived-planes default one decade up — sf0.1 (5k
  *     docs → 9 planes) vs /tmp/sfx1 (50k docs → 12 planes). The point:
  *     with width derived, total time scales ~linearly in the corpus,
  *     closing the suite's one measured super-linear knob (R14bProbe's
  *     fixed planes = 8 ran 24× at the decade).
  *   - `r14`: decade rows for the round-14 entries that had none —
  *     n25 (SQ-tier re-rank), t33 (byte-BPE budget pricing), h9
  *     (product profit), w4 (RANGE rolling window) at sf0.1 and the
  *     sfx1 decade (relational entries use sf0.01→sf0.1 as their
  *     decade — sfx1 carries only the LLM tables at 10×).
  * Not a spec — run via Test/runMain; PERF.md records the outcome.
  */
object R15Probe {
  def main(args: Array[String]): Unit = {
    val section = args.headOption.getOrElse("all")
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
      println(f"R15 $label time=${math.min(t1, t2)}%.2fs rows=$c1")
    }

    if (section == "all" || section == "d11") {
      Seq("/root/testdata/sf0.1", "/tmp/sfx1").foreach { dir =>
        if (new java.io.File(s"$dir/documents.parquet").exists())
          // filter on the computed verdict (R14bProbe's form) so the
          // count can never prune the pair join
          time(s"dir=$dir d11_semantic_dedup",
            SparkEntry.queries("d11_semantic_dedup")(spark, dir)
              .filter(org.apache.spark.sql.functions.col("kept") === 1))
        else println(s"R15 dir=$dir SKIPPED (missing)")
      }
    }
    if (section == "img") {
      // ImageIO caching before/after rows (m8/m9/m11 at sf0.1)
      Seq("m8_decode_jpeg", "m9_decode_png", "m11_decode_gif").foreach(n =>
        time(s"dir=/root/testdata/sf0.1 $n",
          SparkEntry.queries(n)(spark, "/root/testdata/sf0.1")))
    }
    if (section == "all" || section == "n26") {
      // the composed large-nlist chain: wall at both relational SFs +
      // the plan-size comparison against n23 (nlist = 8, unrolled
      // path) — the packed 256-cell plan must not be ~32× the 8-cell
      // one (KMeansLargeKProbe's expression-node proxy)
      def exprNodes(df: org.apache.spark.sql.DataFrame): Int =
        df.queryExecution.optimizedPlan.collect { case p =>
          1 + p.expressions.map(_.collect { case _ => 1 }.sum).sum
        }.sum
      Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { dir =>
        time(s"dir=$dir n26_ivfpq_large_nlist",
          SparkEntry.queries("n26_ivfpq_large_nlist")(spark, dir))
        val n23 = exprNodes(
          SparkEntry.queries("n23_ivfpq_rerank")(spark, dir))
        val n26 = exprNodes(
          SparkEntry.queries("n26_ivfpq_large_nlist")(spark, dir))
        println(s"R15 dir=$dir planNodes n23(nlist=8,unrolled)=$n23 " +
          s"n26(nlist=256,packed)=$n26")
      }
    }
    if (section == "all" || section == "r14") {
      // relational entries: their tables scale sf0.01 → sf0.1
      Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { dir =>
        Seq("h9_product_profit", "w4_rolling_range_frame").foreach(n =>
          time(s"dir=$dir $n", SparkEntry.queries(n)(spark, dir)))
      }
      // LLM-table entries: sf0.1 → the sfx1 decade
      Seq("/root/testdata/sf0.1", "/tmp/sfx1").foreach { dir =>
        if (new java.io.File(s"$dir/documents.parquet").exists()) {
          Seq("n25_ivfpq_rerank_sq", "t33_bpe_byte_source_tokens").foreach(n =>
            time(s"dir=$dir $n", SparkEntry.queries(n)(spark, dir)))
        } else println(s"R15 dir=$dir SKIPPED (missing)")
      }
    }
    spark.stop()
  }
}
