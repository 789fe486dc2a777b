package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.DedupOps

/** Measurement driver for the two connected-components faces — adaptive
  * min-label propagation (`connectedComponents`, shipped d9) and
  * alternating star contractions (`connectedComponentsStar`, d9b / the
  * deep-graph fallback) — on the two graph shapes that separate them:
  *
  *   1. the REAL near-dup pair relation of the bench corpus (sf0.1 and
  *      the sf1-equivalent, `tools/gen_sfx.py`): shallow wide
  *      components, propagation's home turf;
  *   2. an adversarial long PATH graph (diameter = n), where plain
  *      propagation needs diameter rounds, adaptive pointer jumping
  *      O(log n), and star contraction O(log n) rounds over a
  *      SHRINKING edge set.
  *
  * Pair generation is excluded from the timers (the pair set is
  * localCheckpoint-materialized first) so the numbers isolate the
  * clustering step — unlike the d9 bench entry, which contains d2.
  * Not a spec — run via Test/runMain; PERF.md records the outcome.
  */
object CCStarProbe {
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
      println(f"CCSTAR $label time=${math.min(t1, t2)}%.2fs rows=$c1")
    }

    // shape 1: the real pair relation, clustering step isolated
    Seq("/root/testdata/sf0.1", "/tmp/sfx1").foreach { dir =>
      if (new java.io.File(s"$dir/documents.parquet").exists()) {
        val pairs = DedupOps.jaccardPairs(
          DedupOps.cappedShingles(
            DedupOps.shingles(
              Tables.load(spark, dir, "documents"), "doc_id", "text")
              .localCheckpoint(), 100000L),
          0.5).localCheckpoint()
        time(s"dir=$dir adaptive", DedupOps.connectedComponents(pairs))
        time(s"dir=$dir star", DedupOps.connectedComponentsStar(pairs))
      } else println(s"CCSTAR dir=$dir SKIPPED (missing)")
    }

    // shape 2: a path graph 0-1-2-...-n (diameter n). Propagation's
    // maxIter=20 would throw without the star fallback; measure the
    // fallback path as shipped (propagation burns its 20 rounds, then
    // star runs) AND star direct, at two sizes.
    Seq(100000L, 1000000L).foreach { n =>
      val path = spark.range(n - 1)
        .select(col("id").as("d1"), (col("id") + 1).as("d2"))
        .localCheckpoint()
      time(s"path n=$n star_direct", DedupOps.connectedComponentsStar(path))
      time(s"path n=$n adaptive_jump", DedupOps.connectedComponents(path, maxIter = 40))
    }
    spark.stop()
  }
}
