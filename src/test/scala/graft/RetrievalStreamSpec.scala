package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bm25
import graft.streaming.RetrievalStream

/** Streaming BM25 serving parity: text queries streamed against a saved
  * inverted index — in one micro-batch or chopped one file per trigger —
  * must answer exactly like the batch served path on the same queries
  * (the AnnStreamSpec contract for the lexical modality). Also pins the
  * growth contract: an `appendToIndex` between streams is visible to
  * the next stream's batches.
  */
class RetrievalStreamSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val queries = Seq(
    (0L, "spark table merge"),
    (1L, "vector data window batch"),
    (2L, "customer query slow"))

  private def results(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long, Long, Long)] =
    df.select("query_id", "rnk", "doc_id", "score_e15", "n_matched_terms")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet

  private val qSchema = StructType(Seq(StructField("query_id", LongType),
    StructField("q_text", StringType)))

  private def run(indexDir: String, files: Seq[Seq[(Long, String)]],
      onePer: Boolean): Set[(Long, Int, Long, Long, Long)] = {
    val srcDir = Files.createTempDirectory("graft_ret_src").toString
    val base = Files.createTempDirectory("graft_ret").toString
    files.zipWithIndex.foreach { case (rows, i) =>
      rows.toDF("query_id", "q_text").coalesce(1)
        .write.mode("overwrite").parquet(s"$srcDir/f$i")
      new java.io.File(s"$srcDir/f$i").listFiles()
        .foreach(f => f.setLastModified(1700000000000L + i * 60000L))
    }
    val src0 = spark.readStream.schema(qSchema)
    val src = (if (onePer) src0.option("maxFilesPerTrigger", "1") else src0)
      .option("latestFirst", "false").parquet(s"$srcDir/*")
    val q = RetrievalStream.serve(src, indexDir, s"$base/out", s"$base/ck", 5)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    results(spark.read.parquet(s"$base/out"))
  }

  test("streamed serving equals batch serving under any chopping") {
    val docs = Tables.load(spark, sf, "documents")
    val dir = Files.createTempDirectory("graft_ret_idx").toString
    Bm25.buildIndex(docs, "doc_id", "text", dir, nBuckets = 16)
    val expected = results(Bm25.servedTopK(spark, dir, queries, 5))
    assert(expected.nonEmpty, "batch reference is empty")

    assert(run(dir, Seq(queries), onePer = false) === expected,
      "single-batch stream diverged from batch serving")
    assert(run(dir, Seq(queries.take(1), queries.slice(1, 2), queries.drop(2)),
      onePer = true) === expected,
      "chopped stream diverged from batch serving")
    // at-least-once delivery: a duplicated query row within a batch
    // must not double its term contributions
    assert(run(dir, Seq(queries ++ queries.take(1)), onePer = false) === expected,
      "duplicated query rows corrupted the scores")
  }

  test("index growth between streams is served by the next stream") {
    val docs = Tables.load(spark, sf, "documents")
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 === 1)
    val dir = Files.createTempDirectory("graft_ret_grow").toString
    Bm25.buildIndex(half1, "doc_id", "text", dir, nBuckets = 16)
    val beforeGrowth = run(dir, Seq(queries), onePer = false)
    Bm25.appendToIndex(half2, "doc_id", "text", dir)
    val afterGrowth = run(dir, Seq(queries), onePer = false)
    val fullBatch = results(Bm25.servedTopK(spark, dir, queries, 5))
    assert(afterGrowth === fullBatch,
      "post-append stream diverged from batch serving on the grown index")
    assert(afterGrowth !== beforeGrowth,
      "growth produced no observable change — fixture too weak")
  }
}
