package graft

import org.apache.spark.sql.SparkSession

/** Round-18 measurement driver. Sections (select by arg, default all):
  *   - `hybrid`: the before/after evidence for VERDICT r17 #1 — the
  *     reworked b12 (dense corpus side = the persisted vector store
  *     instead of a per-query corpus re-embed), the new b13 (dense
  *     candidates from the cell-pruned IVF-PQ artifact), and the
  *     rewired t38 (pure store scan) at sf0.1 vs the 10× corpus
  *     (/tmp/sfx1). r17's recorded decade rows on the OLD code:
  *     b12 4.03 s → 24.8 s (≈ linear), t38 2.83 s → 21.4 s.
  *   - `sp19`: the one post-input-pin re-probe VERDICT r17 #4 asked
  *     for (its r17 probe row predates the input pin).
  * Timings drive the FULL plan through a noop sink. Not a spec — run
  * via Test/runMain; PERF.md records the outcome, and the fill ledger
  * separates each store's one-time build from the serve cost.
  */
object R18Probe {
  def main(args: Array[String]): Unit = {
    val section = args.headOption.getOrElse("all")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dirs = Seq("/root/testdata/sf0.1", "/tmp/sfx1")
      .filter(d => new java.io.File(s"$d/documents.parquet").exists())

    def time(name: String, dir: String): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val t = math.min(once(), once())
      println(f"R18 dir=$dir $name time=$t%.2fs")
    }

    if (section == "all" || section == "hybrid")
      dirs.foreach { d =>
        time("t38_token_embedding_knn_served", d)
        time("b12_hybrid_served", d)
        time("b13_hybrid_ann_served", d)
        CacheFills.snapshot.filter(_._1.endsWith(s"@$d")).toSeq.sorted
          .foreach { case (k, v) => println(f"R18 fill $k=$v%.2fs") }
      }

    if (section == "all" || section == "sp19")
      dirs.foreach { d =>
        time("sp19_greedy_packed_windows", d)
      }

    // The knob-tuning loop recallStatus exists for, as numbers: the
    // b13 artifact's served recall@10 and measurement cost per nprobe
    // (the nprobe ↔ recall ↔ cost table a production team reads before
    // picking the serving knob).
    if (section == "all" || section == "recall")
      dirs.foreach { d =>
        import org.apache.spark.sql.functions._
        import graft.queries.{RetrievalQueries, TextQueries}
        import graft.operators.{IvfPq, TokenEmbeddingTable}
        import spark.implicits._
        val idx = RetrievalQueries.servedTokenIvfPqDir(spark, d)
        val merges = TextQueries.frozenByteMerges(spark, d)
        val table = TokenEmbeddingTable.load(
          spark, RetrievalQueries.servedTokenEmbDir(spark, d))
        val q = TokenEmbeddingTable.queryVecs(
            RetrievalQueries.Queries.toDF("doc_id", "text"),
            merges, TextQueries.BpePat, table)
          .localCheckpoint()
        Seq(1, 2, 4, 8, 16).foreach { np =>
          val t0 = System.nanoTime()
          val st = IvfPq.recallStatus(spark, idx, q,
            k = 10, nprobe = np, kCand = 20,
            dims = RetrievalQueries.TokDims, threshold = 0.0)
          val t = (System.nanoTime() - t0) / 1e9
          println(f"R18 dir=$d recall_sweep nprobe=$np%2d " +
            f"recall=${st.recall}%.3f time=$t%.2fs")
        }
        // the second axis: with probes held generous, widen the ADC
        // candidate cut — on a 16-dim 4-subspace code the residual
        // quantizer is coarse, so kCand (how many ADC candidates reach
        // the exact re-rank) binds recall long before nprobe does
        Seq(20, 50, 100, 200).foreach { kc =>
          val t0 = System.nanoTime()
          val st = IvfPq.recallStatus(spark, idx, q,
            k = 10, nprobe = 8, kCand = kc,
            dims = RetrievalQueries.TokDims, threshold = 0.0)
          val t = (System.nanoTime() - t0) / 1e9
          println(f"R18 dir=$d recall_sweep_kcand kCand=$kc%3d " +
            f"recall=${st.recall}%.3f time=$t%.2fs")
        }
      }

    spark.stop()
  }
}
