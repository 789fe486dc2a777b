package graft

import org.apache.spark.sql.SparkSession

/** Round-16 measurement driver. Sections (select by arg, default all):
  *   - `t35`: decade rows for the token-ID sequences — sf0.1 vs
  *     /tmp/sfx1 (10× the documents). The claim to confirm: honestly
  *     linear in TOTAL TOKENS (the constant is the per-token map-side
  *     transform; the merge fit is a shared cache billed separately).
  *   - `n27`: the served IVF-PQ chain one decade up — the artifact
  *     fill (save: fit + encode + write, reported from the CacheFills
  *     ledger) vs the STEADY serve cost (load + cell-pruned ADC +
  *     re-rank), which is what a serving tier pays per session. r15's
  *     n26 linearity claim rested on one decomposed probe; the serve
  *     path now has its own steady-state row.
  *   - `r16`: decade rows for the other round-16 entries (sp16, t36,
  *     t37).
  * Timings drive the FULL plan through a noop sink (a bare count()
  * prunes pure projections — the md5/detok columns would vanish).
  * Not a spec — run via Test/runMain; PERF.md records the outcome.
  */
object R16Probe {
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
      println(f"R16 dir=$dir $label time=$t%.2fs")
    }

    if (section == "all" || section == "t35")
      dirs.foreach { d =>
        // report the corpus weight so the ratio is judged in tokens,
        // not docs (sfx1 multiplies docs 10×; token totals decide)
        val toks = SparkEntry.queries("t34_bpe_doc_tokens")(spark, d)
          .agg(org.apache.spark.sql.functions.sum("n_tokens"))
          .first().getLong(0)
        println(s"R16 dir=$d total_tokens=$toks")
        time("t35_bpe_token_ids", "t35_bpe_token_ids", d)
      }

    if (section == "all" || section == "r16")
      dirs.foreach { d =>
        time("sp16_packed_windows", "sp16_packed_windows", d)
        time("t36_bpe_detokenize", "t36_bpe_detokenize", d)
        time("t37_token_embedding_knn", "t37_token_embedding_knn", d)
      }

    if (section == "all" || section == "r16b")
      dirs.foreach { d =>
        time("sp17_shard_manifest", "sp17_shard_manifest", d)
        time("x10_training_shard_release", "x10_training_shard_release", d)
      }

    if (section == "all" || section == "n27")
      dirs.foreach { d =>
        // first call pays the artifact save (fit shared with n26 via
        // largeNlist) — the ledger separates it; the timed reps after
        // are the steady serve cost
        time("n27_ivfpq_served", "n27_ivfpq_served", d)
        CacheFills.snapshot.filter(_._1.endsWith(s"@$d")).toSeq.sorted
          .foreach { case (k, v) => println(f"R16 fill $k=$v%.2fs") }
      }

    spark.stop()
  }
}
