package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Measurement driver for DecontStream at data scale: index the test
  * split's grams once, stream the train split through the filter in 5
  * chunks, report wall and verdict counts. Run via Test/runMain with
  * SPARK_GRAFT_SF_DIR.
  */
object DecontStreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.streaming.DecontStream
    val bucket = (conv(substring(md5(col("doc_id").cast("string")), 1, 8),
      16, 10).cast("bigint") % 100)
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val train = docs.filter(bucket < 80)
    val test = docs.filter(bucket >= 90)
    val n = train.count()
    val base = java.nio.file.Files.createTempDirectory("graft_dcp").toString
    val t0 = System.nanoTime()
    DecontStream.buildGramIndex(test, s"$base/idx")
    val tIndex = (System.nanoTime() - t0) / 1e9
    // one file per chunk: with maxFilesPerTrigger=1 the file count IS
    // the micro-batch count (a partitionBy write here produced ~32
    // files per chunk and 160 one-file batches — 180 s of pure
    // per-batch overhead masquerading as operator cost)
    val maxId = train.agg(max("doc_id")).first().getLong(0)
    (0 until 5).foreach { i =>
      train.filter(col("doc_id") >= i * (maxId / 5 + 1) &&
          col("doc_id") < (i + 1) * (maxId / 5 + 1))
        .coalesce(1).write.mode("overwrite").parquet(s"$base/src/f$i")
      new java.io.File(s"$base/src/f$i").listFiles()
        .foreach(f => f.setLastModified(1700000000000L + i * 60000L))
    }
    val src = spark.readStream
      .schema(docs.schema).option("maxFilesPerTrigger", "1")
      .parquet(s"$base/src/*")
    val t1 = System.nanoTime()
    val q = DecontStream.decontaminateFilter(src, s"$base/idx",
        s"$base/out", s"$base/ck")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val wall = (System.nanoTime() - t1) / 1e9
    val out = spark.read.parquet(s"$base/out")
    val dirty = out.filter(!col("clean")).count()
    println(f"DCPROBE sf=$sfDir train=$n index=$tIndex%.1fs stream=$wall%.1fs dirty=$dirty")
    spark.stop()
  }
}
