package graft

import org.apache.spark.sql.SparkSession

/** Decade-up measurement for the round-13 additions and the eleventh-
  * wave leftovers VERDICT r12 #7 flagged: h3/h5/h10 are lineitem-shaped
  * (no sf1-equivalent exists), so they ride the ordinary sf0.01→sf0.1
  * bench decade; the BPE trainer/tokenizer and the GIF/AIFF decodes are
  * documents-shaped and run the full sf0.1 → sf1-equivalent
  * (`tools/gen_sfx.py`, 10×) protocol. Not a spec — run via
  * Test/runMain; PERF.md records the outcome.
  */
object R13Probe {
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
      println(f"R13 $label time=${math.min(t1, t2)}%.2fs rows=$c1")
    }

    // lineitem decade: sf0.01 -> sf0.1
    val liNames = Seq("h3_shipping_priority", "h5_local_supplier",
      "h10_returned_items")
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { dir =>
      liNames.foreach(n => time(s"dir=$dir $n",
        SparkEntry.queries(n)(spark, dir)))
    }

    // documents decade: sf0.1 -> sf1-equivalent
    val docNames = Seq("t27_bpe_train", "t28_bpe_tokenize",
      "m11_decode_gif", "m12_decode_aiff")
    Seq("/root/testdata/sf0.1", "/tmp/sfx1").foreach { dir =>
      if (new java.io.File(s"$dir/documents.parquet").exists())
        docNames.foreach(n => time(s"dir=$dir $n",
          SparkEntry.queries(n)(spark, dir)))
      else println(s"R13 dir=$dir SKIPPED (missing)")
    }
    spark.stop()
  }
}

/** Group-scalability measurement for the single-read grouped
  * partial-partition reader (`SketchStream.mergedCountersBy`,
  * VERDICT r12 "What's wrong" #1): the read PLAN must stay one
  * scan + one anti-join + one aggregate whatever the group count, and
  * the wall must scale with DATA, not with the number of `g=` subtrees
  * (the per-group unionByName it replaced built one subplan per
  * group). Writes synthetic stores with 10 vs 1,000 group subtrees ×
  * 3 batch partials each (plus a compaction marker per store) and
  * reports plan node counts and read wall for both.
  */
object GroupedReaderProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._

    def buildStore(dir: String, nGroups: Int): Unit = {
      val cells = spark.range(nGroups.toLong * 3 * 5)
        .select(
          concat(lit("g"), (col("id") % nGroups)).as("g"),
          lit(0).as("r"),
          (col("id") % 7).as("idx"),
          (col("id") % 100 + 1).as("c"),
          ((col("id") / nGroups) % 3).as("_batch_id"))
      // one absorbed-batch marker row in group g0: batch 0 folded
      val marker = spark.range(1)
        .select(lit("g0").as("g"), lit(-1).as("r"), lit(0L).as("idx"),
          lit(0L).as("c"), lit(-1L).as("_batch_id"))
      cells.unionByName(marker)
        .write.mode("overwrite").partitionBy("g", "_batch_id").parquet(dir)
    }

    Seq(10, 100, 1000).foreach { n =>
      val dir = s"/tmp/graft_grp_probe_$n"
      buildStore(dir, n)
      val df = graft.streaming.SketchStream.mergedCountersBy(spark, dir)
      val planNodes = df.queryExecution.executedPlan.toString
        .linesIterator.size
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val c = graft.streaming.SketchStream.mergedCountersBy(spark, dir).count()
        ((System.nanoTime() - t0) / 1e9, c)
      }
      once()
      val (t1, c1) = once()
      val (t2, _) = once()
      println(f"GroupedReader groups=$n planNodes=$planNodes " +
        f"time=${math.min(t1, t2)}%.2fs rows=$c1")

      // the replaced per-group reader shape, reconstructed for
      // contrast: one mergedCounters sub-read per g= subtree, unioned
      // (plan linear in groups; skipped at 1,000 — the point is made)
      if (n <= 100) {
        def oldStyle() = {
          val t0 = System.nanoTime()
          val merged = (0 until n).map { g =>
            graft.streaming.SketchStream.mergedCounters(spark, s"$dir/g=g$g")
              .select(lit(s"g$g").as("g"), col("r"), col("idx"), col("c"))
          }.reduce(_.unionByName(_))
          val planNodesOld = merged.queryExecution.executedPlan.toString
            .linesIterator.size
          val c = merged.count()
          ((System.nanoTime() - t0) / 1e9, planNodesOld, c)
        }
        oldStyle()
        val (ot, opn, oc) = oldStyle()
        println(f"GroupedReader groups=$n OLD-unionByName planNodes=$opn " +
          f"time=$ot%.2fs rows=$oc")
      }
    }
    spark.stop()
  }
}
