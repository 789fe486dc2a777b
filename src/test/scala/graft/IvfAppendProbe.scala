package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement driver for the incremental-growth economics of a
  * persisted IVF index: appending a 10 % delta to a 90 % index vs
  * rebuilding (fit + assign + save) the full corpus from scratch — the
  * claim under test is that append cost tracks the DELTA, not the
  * corpus. Run via Test/runMain with SPARK_GRAFT_SF_DIR.
  */
object IvfAppendProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.IvfIndex
    val emb = Tables.load(spark, sfDir, "embeddings")
    val n = emb.count()
    val cut = (n * 9) / 10
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    // full rebuild: what growth costs WITHOUT appendToSaved
    val fullDir = java.nio.file.Files.createTempDirectory("graft_iap_full").toString
    val (_, tRebuild) = timed {
      IvfIndex.save(IvfIndex.build(emb, nlist = 16, knownN = n), fullDir)
    }
    // base index on 90 %, then append the 10 % delta
    val baseDir = java.nio.file.Files.createTempDirectory("graft_iap_base").toString
    IvfIndex.save(IvfIndex.build(emb.filter(col("vec_id") < cut),
      nlist = 16, knownN = cut), baseDir)
    val (appended, tAppend) = timed {
      IvfIndex.appendToSaved(spark, baseDir, emb.filter(col("vec_id") >= cut))
    }
    // serving sanity on the grown index
    val served = IvfIndex.searchPruned(IvfIndex.load(spark, baseDir),
      Seq(0L, cut, n - 1), 10, nprobe = 4).count()
    println(f"IVFAPPEND sf=$sfDir n=$n delta=$appended rebuild=$tRebuild%.1fs " +
      f"append=$tAppend%.1fs ratio=${tRebuild / tAppend}%.1fx served=$served")
    spark.stop()
  }
}
