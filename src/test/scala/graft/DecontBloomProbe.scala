package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.DedupOps

/** Measurement driver for the bloom-prefiltered decontamination
  * (DedupOps.crossSplitOverlapBloom, d8b) against the plain shape
  * (crossSplitOverlap, d8) at sf0.1 and the sf1-equivalent
  * (`tools/gen_sfx.py`). The bloom's claim is structural: both train-
  * side shuffles shrink from O(all train grams) to O(leakage + fpp ·
  * train grams), bought for one extra pass over the train grams (the
  * membership scan) and one over the test grams (the sketch build) —
  * so the decade-up WALL ratio is the honest judge of whether the
  * trade pays on this corpus, and the output equality is already
  * hash-pinned by the shared d8 oracle. Not a spec — run via
  * Test/runMain; PERF.md records the outcome.
  */
object DecontBloomProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 8),
      16, 10).cast("bigint") % 100

    def time(label: String, f: => org.apache.spark.sql.DataFrame): Unit = {
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val c = f.count()
        ((System.nanoTime() - t0) / 1e9, c)
      }
      once()
      val (t1, c1) = once()
      val (t2, _) = once()
      println(f"DBLOOM $label time=${math.min(t1, t2)}%.2fs rows=$c1")
    }

    Seq("/root/testdata/sf0.1", "/tmp/sfx1").foreach { dir =>
      if (new java.io.File(s"$dir/documents.parquet").exists()) {
        val docs = Tables.load(spark, dir, "documents")
          .select("doc_id", "text").localCheckpoint()
        val train = docs.filter(bucket < 80)
        val test = docs.filter(bucket >= 90)
        time(s"dir=$dir plain",
          DedupOps.crossSplitOverlap(train, test, "doc_id", "text", n = 8))
        time(s"dir=$dir bloom",
          DedupOps.crossSplitOverlapBloom(train, test, "doc_id", "text", n = 8))
      } else println(s"DBLOOM dir=$dir SKIPPED (missing)")
    }
    spark.stop()
  }
}
