package graft

import org.apache.spark.sql.functions._

/** Throwaway stage-cost decomposition for d2b at sf0.1 (VERDICT r18
  * #2): where does jaccardPairsPrefix spend its time — candidate
  * generation or exact verification — and how many candidates do the
  * positional + indexing bounds kill? Test/runMain graft.D2bProbe.
  */
object D2bProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val sf = "/root/testdata/sf0.1"
    val sh = graft.operators.DedupOps.shingles(
      Tables.load(spark, sf, "documents"), "doc_id", "text")
      .localCheckpoint()
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[d2bprobe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val nDocs = sh.select("doc_id").distinct().count()
    val nSh = sh.count()
    println(s"[d2bprobe] docs=$nDocs shingleRows=$nSh")
    val cand = timed("prefixCandidates") {
      graft.operators.DedupOps.prefixCandidates(sh, 0.5).localCheckpoint()
    }
    println(s"[d2bprobe] candidates=${timed("cand count")(cand.count())}")
    timed("verify join") {
      cand
        .join(sh.as("x"), col("d1") === col("x.doc_id"))
        .join(sh.as("y"),
          col("d2") === col("y.doc_id") &&
            col("x.shingle") === col("y.shingle"))
        .groupBy("d1", "d2", "n1", "n2").agg(count(lit(1)).as("shared"))
        .count()
    }
    timed("full jaccardPairsPrefix") {
      graft.operators.DedupOps.jaccardPairsPrefix(sh, 0.5).count()
    }
    timed("full jaccardPairs (d2)") {
      graft.operators.DedupOps.jaccardPairs(sh, 0.5).count()
    }
  }
}
