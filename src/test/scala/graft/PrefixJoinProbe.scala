package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.DedupOps

/** Measurement driver for the prefix-filtered Jaccard pair finder
  * (DedupOps.jaccardPairsPrefix) against the shipped inverted-index
  * finder, on a corpus with the POWER-LAW shape the prefix principle
  * targets: per-doc-unique body words (28), a universal 12-word
  * boilerplate tail on every document, a true near-dup body pair every
  * 1000 docs, and one PURE-boilerplate duplicate pair — the case that
  * separates lossless prefix filtering from the df cap structurally:
  * the cap zeroes an all-boilerplate document out of the index (its
  * similarity is forfeited by design), while the prefix always indexes
  * each document's rarest (1-t) fraction, whatever its absolute df.
  * Not a spec — run via Test/runMain; PERF.md records the outcome.
  */
object PrefixJoinProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val boiler = "all rights reserved worldwide please contact us for more information today thanks"

    def corpus(n: Long) = {
      val base = spark.range(n).select(col("id").as("doc_id"),
        concat(
          concat_ws(" ", expr(
            """transform(sequence(0, 27),
               j -> concat('w', CASE WHEN id % 1000 < 2
                                     THEN id - id % 2 ELSE id END,
                           '_', j))""")),
          lit(" " + boiler)).as("text"))
      import spark.implicits._
      base.unionByName(
        Seq((n, boiler), (n + 1, boiler)).toDF("doc_id", "text"))
    }

    def time(f: => org.apache.spark.sql.DataFrame): (Double, Long) = {
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val c = f.count()
        ((System.nanoTime() - t0) / 1e9, c)
      }
      once()
      val (t1, c) = once()
      val (t2, _) = once()
      (math.min(t1, t2), c)
    }

    Seq(2000L, 5000L, 50000L).foreach { n =>
      val sh = DedupOps.shingles(corpus(n), "doc_id", "text").localCheckpoint()
      val truePairs = n / 1000 + 1 // body dups + the pure-boiler pair
      val (tp, cp) = time(DedupOps.jaccardPairsPrefix(sh, 0.5))
      // the capped baseline is the SHIPPED d2 shape: the capped index is
      // materialized before feeding the three plan branches (review r11
      // — without it the df pass re-executes per branch, inflating the
      // baseline). The checkpoint runs inside the timer, as d2 pays it.
      val (tc, cc) = time(DedupOps.jaccardPairs(
        DedupOps.cappedShingles(sh, maxDf = 1000L).localCheckpoint(), 0.5))
      println(f"PREFIX n=$n prefix=$tp%.2fs/$cp capped=$tc%.2fs/$cc expected=$truePairs")
      if (n <= 2000L) {
        val (tu, cu) = time(DedupOps.jaccardPairs(sh, 0.5))
        println(f"PREFIX n=$n uncapped=$tu%.2fs/$cu")
      }
    }
    spark.stop()
  }
}
