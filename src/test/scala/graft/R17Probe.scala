package graft

import org.apache.spark.sql.SparkSession

/** Round-17 measurement driver. Sections (select by arg, default all):
  *   - `sp18`: the decade row r16 left unrecorded (VERDICT r16 #8) —
  *     the greedy fold at sf0.1 vs /tmp/sfx1 (10× the documents). The
  *     claim: the per-shard sequential fold is linear in documents per
  *     shard and FLAT in the window size W (the fold's state is
  *     (window, fill) regardless of W) — timed at W = 2048 and
  *     W = 65536 on the same corpus.
  *   - `r17`: decade rows for the round-17 entries (sp19, x12, b11,
  *     t38).
  *   - `n28`: the DataFrame-native served IVF-PQ chain one decade up,
  *     next to n27's driver-LUT face on the same artifact (the fill
  *     ledger separates the one-time save).
  * Timings drive the FULL plan through a noop sink (a bare count()
  * would prune pure projections). Not a spec — run via Test/runMain;
  * PERF.md records the outcome.
  */
object R17Probe {
  def main(args: Array[String]): Unit = {
    val section = args.headOption.getOrElse("all")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dirs = Seq("/root/testdata/sf0.1", "/tmp/sfx1")
      .filter(d => new java.io.File(s"$d/documents.parquet").exists())

    def time(label: String, name: String, dir: String): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val t = math.min(once(), once())
      println(f"R17 dir=$dir $label time=$t%.2fs")
    }

    if (section == "all" || section == "sp18")
      dirs.foreach { d =>
        time("sp18_greedy_doc_packing", "sp18_greedy_doc_packing", d)
        // flat-in-W: the same fold at a 32× window over the SAME
        // pinned counts — only the window ids change, not the work
        // (state is (window, fill) either way). Counts approximated by
        // whitespace token counts: the fold prices (doc_id, n) rows and
        // does not care where n came from.
        import org.apache.spark.sql.functions._
        val counts = Tables.load(spark, d, "documents")
          .select(col("doc_id"),
            size(split(col("text"), " ")).cast("bigint").as("n_tokens"))
          .localCheckpoint()
        def packAt(w: Long): Double = {
          def once(): Double = {
            val t0 = System.nanoTime()
            graft.operators.ContextPacking.packGreedyCounts(counts, w)
              .write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          once(); math.min(once(), once())
        }
        println(f"R17 dir=$d sp18_fold_w2048 time=${packAt(2048L)}%.2fs")
        println(f"R17 dir=$d sp18_fold_w65536 time=${packAt(65536L)}%.2fs")
      }

    if (section == "all" || section == "r17")
      dirs.foreach { d =>
        time("sp19_greedy_packed_windows", "sp19_greedy_packed_windows", d)
        time("x12_greedy_shard_release", "x12_greedy_shard_release", d)
        time("b11_hybrid_rrf", "b11_hybrid_rrf", d)
        time("t38_token_embedding_knn_served", "t38_token_embedding_knn_served", d)
      }

    if (section == "all" || section == "r17b")
      dirs.foreach { d =>
        time("n30_ivfpq_recall", "n30_ivfpq_recall", d)
        time("sp20_epoch_shuffle", "sp20_epoch_shuffle", d)
      }

    if (section == "all" || section == "r17c")
      dirs.foreach { d =>
        time("b12_hybrid_served", "b12_hybrid_served", d)
      }

    if (section == "all" || section == "n28")
      dirs.foreach { d =>
        time("n27_ivfpq_served", "n27_ivfpq_served", d)
        time("n28_ivfpq_served_df", "n28_ivfpq_served_df", d)
        CacheFills.snapshot.filter(_._1.endsWith(s"@$d")).toSeq.sorted
          .foreach { case (k, v) => println(f"R17 fill $k=$v%.2fs") }
      }

    spark.stop()
  }
}
