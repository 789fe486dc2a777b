package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Decade-up measurement for the streaming corpus pipeline: the corpus
  * streamed in 5 id-ordered chops through `CorpusStream.cleanStream`
  * (gate + cross-batch dedup + split) at sf0.1 (5k docs) vs the
  * sf1-equivalent (50k docs, tools/gen_sfx.py). The claim under test:
  * per-batch work is bounded by batch size (index reads pruned to the
  * batch's buckets), so wall should scale ~linearly with the corpus,
  * not with history². Not a spec — run via Test/runMain; PERF.md
  * records the outcome.
  */
object CorpusStreamProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("source", StringType), StructField("text", StringType)))

    for (dir <- Seq("/root/testdata/sf0.1", "/tmp/sfx1")) {
      if (!new java.io.File(s"$dir/documents.parquet").exists())
        println(s"CSTREAM dir=$dir SKIPPED (missing)")
      else {
        val docs = spark.read.parquet(s"$dir/documents.parquet")
          .select("doc_id", "source", "text")
        val n = docs.count()
        val srcDir = Files.createTempDirectory("graft_csp_src").toString
        val base = Files.createTempDirectory("graft_csp").toString
        val chop = (n / 5) + 1
        (0 until 5).foreach { i =>
          docs.filter(col("doc_id") >= i * chop && col("doc_id") < (i + 1) * chop)
            .coalesce(1).write.mode("overwrite").parquet(s"$srcDir/f$i")
          new java.io.File(s"$srcDir/f$i").listFiles()
            .foreach(f => f.setLastModified(1700000000000L + i * 60000L))
        }
        val src = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1")
          .option("latestFirst", "false").parquet(s"$srcDir/*")
        val t0 = System.nanoTime()
        val q = graft.streaming.CorpusStream.cleanStream(src,
            s"$base/idx", s"$base/out", s"$base/ck",
            threshold = 0L, nBuckets = 64)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        val secs = (System.nanoTime() - t0) / 1e9
        val kept = spark.read.parquet(s"$base/out").count()
        println(f"CSTREAM dir=$dir docs=$n kept=$kept batches=5 wall=$secs%.2fs")
      }
    }
    spark.stop()
  }
}
