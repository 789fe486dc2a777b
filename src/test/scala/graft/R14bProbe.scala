package graft

import org.apache.spark.sql.SparkSession

import graft.operators.{HashedEmbedding, SemanticDedup}

/** The d11 occupancy knob, demonstrated at the sfx1 decade: planes = 8
  * (the gated-scale default, 256 cells) vs planes = 12 (4096 cells —
  * log2(n/target) for the 10× corpus). The operator's scaladoc sizes
  * the knob analytically (each plane halves expected occupancy; pairs
  * are quadratic in occupancy); this measures it. Not a spec — run via
  * Test/runMain; PERF.md records the outcome.
  */
object R14bProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = HashedEmbedding.embed(
      Tables.load(spark, "/tmp/sfx1", "documents"), "doc_id", "text")
      .localCheckpoint()

    def once(planes: Int): (Double, Long) = {
      val t0 = System.nanoTime()
      val kept = SemanticDedup.dedupVerdicts(emb, eps = 0.95, planes = planes)
        .filter(org.apache.spark.sql.functions.col("kept") === 1).count()
      ((System.nanoTime() - t0) / 1e9, kept)
    }
    Seq(8, 12).foreach { p =>
      once(p)
      val (t, kept) = once(p)
      println(f"R14b d11 sfx1 planes=$p time=$t%.2fs kept=$kept")
    }
    spark.stop()
  }
}
