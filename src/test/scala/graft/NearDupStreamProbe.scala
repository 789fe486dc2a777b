package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Measurement driver for DocStream.nearDupFilter at data scale: streams
  * the documents table in ~5 id-ordered chunks and reports total wall
  * and decision counts. Run via Test/runMain with SPARK_GRAFT_SF_DIR.
  */
object NearDupStreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val n = docs.count()
    val chunk = (n / 5 + 1)
    val base = java.nio.file.Files.createTempDirectory("graft_ndp").toString
    (0 until 5).foreach { i =>
      docs.filter(col("doc_id") >= i * chunk && col("doc_id") < (i + 1) * chunk)
        .coalesce(1).write.mode("overwrite").parquet(s"$base/src/f$i")
      new java.io.File(s"$base/src/f$i").listFiles()
        .foreach(f => f.setLastModified(1700000000000L + i * 60000L))
    }
    val src = spark.readStream
      .schema(docs.schema).option("maxFilesPerTrigger", "1")
      .parquet(s"$base/src/*")
    val t0 = System.nanoTime()
    val q = graft.streaming.DocStream.nearDupFilter(src,
        s"$base/idx", s"$base/out", s"$base/ck", threshold = 0.5)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val wall = (System.nanoTime() - t0) / 1e9
    val out = spark.read.parquet(s"$base/out")
    val keptN = out.filter(col("kept")).count()
    println(f"NDPROBE sf=$sfDir docs=$n wall=$wall%.1fs kept=$keptN dropped=${n - keptN}")
    spark.stop()
  }
}
