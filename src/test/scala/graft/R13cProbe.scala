package graft

import org.apache.spark.sql.SparkSession

/** Decade-up measurement for the round-13 second wave: the k-means
  * faces (embeddings decade sf0.1 → sf1-equivalent, fit timed
  * separately from serving since the cached-fit contract hides it from
  * the entries), the snapshot diff (documents decade), and h18
  * (lineitem decade sf0.01 → sf0.1 — no sf1-equivalent exists for the
  * relational facts). Not a spec — run via Test/runMain; PERF.md
  * records the outcome.
  */
object R13cProbe {
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
      println(f"R13c $label time=${math.min(t1, t2)}%.2fs rows=$c1")
    }

    // embeddings decade: the fit itself (k=8, 3 rounds), then the faces
    Seq("/root/testdata/sf0.1", "/tmp/sfx1").foreach { dir =>
      if (new java.io.File(s"$dir/embeddings.parquet").exists()) {
        val emb = Tables.load(spark, dir, "embeddings")
        def fitOnce(): Double = {
          val t0 = System.nanoTime()
          graft.operators.KMeans.fit(emb, 8, 3)
          (System.nanoTime() - t0) / 1e9
        }
        fitOnce()
        println(f"R13c dir=$dir kmeans_fit time=${math.min(fitOnce(), fitOnce())}%.2fs")
        Seq("n13_kmeans_assign", "n14_kmeans_summary", "n15_cluster_coreset")
          .foreach(n => time(s"dir=$dir $n", SparkEntry.queries(n)(spark, dir)))
      } else println(s"R13c dir=$dir SKIPPED (missing)")
    }

    // documents decade
    Seq("/root/testdata/sf0.1", "/tmp/sfx1").foreach { dir =>
      if (new java.io.File(s"$dir/documents.parquet").exists())
        time(s"dir=$dir x10_snapshot_diff",
          SparkEntry.queries("x10_snapshot_diff")(spark, dir))
      else println(s"R13c dir=$dir SKIPPED (missing)")
    }

    // lineitem decade
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { dir =>
      time(s"dir=$dir h18_large_orders",
        SparkEntry.queries("h18_large_orders")(spark, dir))
    }
    spark.stop()
  }
}
