package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{RetrievalQueries, TextQueries}
import graft.streaming.HybridStream

/** Streaming hybrid serving parity (VERDICT r17 #2): a query-string
  * stream answered per micro-batch by artifact-served BM25 +
  * artifact-served IVF-PQ + integer RRF must produce EXACTLY the batch
  * b13 entry's fused lists — in one micro-batch, chopped one file per
  * trigger, or with duplicated rows (the StreamComposeSpec discipline
  * for the fused contract), and crash replay must be invisible.
  */
class HybridStreamSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val queries = RetrievalQueries.Queries

  private def results(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long, Long, Long)] =
    df.select("query_id", "rnk", "doc_id", "rrf_e12", "n_lists")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet

  private val qSchema = StructType(Seq(StructField("query_id", LongType),
    StructField("q_text", StringType)))

  private def run(files: Seq[Seq[(Long, String)]], onePer: Boolean,
      allowed: Option[org.apache.spark.sql.DataFrame] = None)
      : (String, Set[(Long, Int, Long, Long, Long)]) = {
    val srcDir = Files.createTempDirectory("graft_hyb_src").toString
    val base = Files.createTempDirectory("graft_hyb").toString
    files.zipWithIndex.foreach { case (rows, i) =>
      rows.toDF("query_id", "q_text").coalesce(1)
        .write.mode("overwrite").parquet(s"$srcDir/f$i")
      new java.io.File(s"$srcDir/f$i").listFiles()
        .foreach(f => f.setLastModified(1700000000000L + i * 60000L))
    }
    val src0 = spark.readStream.schema(qSchema)
    val src = (if (onePer) src0.option("maxFilesPerTrigger", "1") else src0)
      .option("latestFirst", "false").parquet(s"$srcDir/*")
    val bm25Dir = RetrievalQueries.servedBm25Dir(spark, sf)
    val tableDir = RetrievalQueries.servedTokenEmbDir(spark, sf)
    val annDir = RetrievalQueries.servedTokenIvfPqDir(spark, sf)
    val merges = TextQueries.frozenByteMerges(spark, sf)
    val kCand = graft.operators.IvfPq.loadKnobs(spark, annDir).get.kCand
    val q = (allowed match {
      case Some(a) => HybridStream.serveScoped(src, bm25Dir, tableDir,
        annDir, merges, TextQueries.BpePat, s"$base/out", s"$base/ck",
        k = RetrievalQueries.HybK, nprobe = RetrievalQueries.TokNprobe,
        kCand = kCand, dims = RetrievalQueries.TokDims, allowed = a)
      case None => HybridStream.serve(src, bm25Dir, tableDir, annDir,
        merges, TextQueries.BpePat, s"$base/out", s"$base/ck",
        k = RetrievalQueries.HybK, nprobe = RetrievalQueries.TokNprobe,
        kCand = kCand, dims = RetrievalQueries.TokDims)
    }).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    (base, results(spark.read.parquet(s"$base/out")))
  }

  test("fused streamed serving ≡ batch b13 under any chopping; duplicates collapse") {
    val expected = results(
      SparkEntry.queries("b13_hybrid_ann_served")(spark, sf))
    assert(expected.nonEmpty, "batch b13 reference is empty")
    assert(run(Seq(queries), onePer = false)._2 === expected,
      "single-batch fused stream diverged from batch b13")
    assert(run(Seq(queries.take(1), queries.slice(1, 2), queries.drop(2)),
      onePer = true)._2 === expected,
      "chopped fused stream diverged from batch b13")
    // at-least-once delivery within a batch: a duplicated query row
    // must not double either leg's RRF contributions
    assert(run(Seq(queries ++ queries.take(1)), onePer = false)._2 === expected,
      "duplicated query rows corrupted the fusion")
  }

  test("scoped stream ≡ batch b14: the grant applies per batch, chopped or not (VERDICT r18 #3)") {
    val expected = results(
      SparkEntry.queries("b14_hybrid_filtered")(spark, sf))
    assert(expected.nonEmpty, "batch b14 reference is empty")
    val allowed = Tables.load(spark, sf, "documents")
      .filter(col("source").isin(RetrievalQueries.ScopeSources: _*))
      .select("doc_id")
    assert(run(Seq(queries), onePer = false,
      allowed = Some(allowed))._2 === expected,
      "single-batch scoped stream diverged from batch b14")
    assert(run(Seq(queries.take(1), queries.drop(1)), onePer = true,
      allowed = Some(allowed))._2 === expected,
      "chopped scoped stream diverged from batch b14")
    // every served doc passes the grant — the governance invariant
    val allowedSet = allowed.collect().map(_.getLong(0)).toSet
    assert(expected.forall(r => allowedSet(r._3)),
      "a doc outside the grant leaked into the scoped results")
  }

  test("crash replay overwrites its own batch partition") {
    val (base, first) = run(Seq(queries), onePer = false)
    // simulate a replay of batch 0: the same fused result written again
    // under the same _batch_id must overwrite, not append
    SparkEntry.queries("b13_hybrid_ann_served")(spark, sf)
      .withColumn("_batch_id", lit(0L))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("_batch_id").parquet(s"$base/out")
    assert(results(spark.read.parquet(s"$base/out")) === first,
      "replayed batch must overwrite its own partition, not append")
  }
}
