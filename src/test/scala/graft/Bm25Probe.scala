package graft

import org.apache.spark.sql.SparkSession

/** Captures the pinned-oracle values for b3/b4 (full ln-idf BM25 top-k
  * is a constant of (corpus, queries, k) — see RetrievalQueries): the
  * integer corpus fingerprint Σ doc_id·n_chars and the top-k rows per
  * test corpus. Run via Test/runMain; the printed VALUES rows paste
  * verbatim into RetrievalQueries.PinnedTopKOracle's VALUES list.
  * Not a spec.
  */
object Bm25Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._

    val queries = Seq(
      (0L, "spark table merge"),
      (1L, "vector data window batch"),
      (2L, "customer query slow"))

    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      val docs = Tables.load(spark, d, "documents")
      val f = docs.agg(sum(col("doc_id") * col("n_chars"))).head().getLong(0)
      val rows = graft.operators.Bm25
        .topK(docs, "doc_id", "text", queries, k = 5)
        .orderBy("query_id", "rnk").collect()
      println(s"-- $sf fingerprint=$f")
      rows.foreach { r =>
        println(s"($f, ${r.getLong(0)}, ${r.getInt(1)}, ${r.getLong(2)}, ${r.getLong(3)}, ${r.getLong(4)}),")
      }
    }
    spark.stop()
  }
}
