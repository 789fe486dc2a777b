package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bm25, CorpusPipeline}
import graft.pipeline.Producer
import graft.streaming.CorpusStream

/** END-TO-END streaming composition (VERDICT r11 #8): the producer's
  * staged JSON unload → the pipe's continuous file source shredding
  * each line → `CorpusStream.cleanStream` (quality gate → cross-batch
  * exact dedup → split) → a BM25 index built over the kept docs and
  * SERVED — the real faces driven in one chain, catching cross-face
  * composition drift the per-face specs cannot see (the DemoReplaySpec
  * discipline applied to the streaming surfaces).
  *
  * Identity scheme: doc_id = xxhash64(text), so the same content
  * carries the same id however often and wherever it arrives — which
  * makes the at-least-once redelivery case well-defined: cleanStream's
  * documented same-id redelivery yields a byte-identical second kept
  * row (CorpusStream scaladoc), so STREAM output is compared as a SET,
  * and `Bm25.buildIndex`'s own dropDuplicates gives the served index
  * set semantics for free. Everything else — gate, split, scoring — is
  * deterministic, so stream and batch must agree exactly.
  */
class StreamComposeSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  private val shredSchema = StructType(Seq(
    StructField("usertype", StringType),
    StructField("start_station_name", StringType),
    StructField("end_station_name", StringType),
    StructField("program_name", StringType)))

  /** The pipe's shred + document construction, shared verbatim by the
    * stream and the batch twin — route-level documents, so identical
    * routes are genuine exact duplicates for the dedup stage.
    */
  private def toDocs(lines: org.apache.spark.sql.DataFrame) =
    lines.select(from_json(col("value"), shredSchema).as("j"))
      .select(concat_ws(" ", col("j.usertype"), col("j.start_station_name"),
        col("j.end_station_name"), col("j.program_name")).as("text"),
        col("j.usertype").as("source"))
      .withColumn("doc_id", xxhash64(col("text")))
      .select("doc_id", "source", "text")

  private type Row6 = (Long, String, String, Long, Long, String)
  private def rows(df: org.apache.spark.sql.DataFrame): Set[Row6] =
    df.select("doc_id", "source", "text", "logit", "n_tokens", "split")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
      .toSet

  private def served(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long, Long, Long)] =
    df.select("query_id", "rnk", "doc_id", "score_e15", "n_matched_terms")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet

  test("producer → pipe → cleanStream → served BM25 equals the batch path at sf0.01") {
    val stage = Files.createTempDirectory("graft_e2e_stage").toString
    val base = Files.createTempDirectory("graft_e2e").toString

    // 1. PRODUCER: real 3-join unload of a three-day range (T6/S7)
    val nDays = Producer.streamData(spark, sf, stage, "01/02/1995", "01/04/1995")
    assert(nDays === 3, "golden count: one staged file set per day")
    val staged = new java.io.File(stage).listFiles()
      .filter(_.getName.endsWith(".json")).sortBy(_.getName)
    assert(staged.length === 3)
    // pin batch order: day files then the redelivery, by mtime
    staged.zipWithIndex.foreach { case (f, i) =>
      f.setLastModified(1700000000000L + i * 60000L); ()
    }
    // at-least-once reality: day 1's file is delivered AGAIN later
    val redelivered = new java.io.File(stage, "redelivered_day1.json")
    java.nio.file.Files.copy(staged.head.toPath, redelivered.toPath)
    redelivered.setLastModified(1700000000000L + 10 * 60000L)

    // 2. PIPE → 3. CLEAN: continuous file source, one file per
    // micro-batch (four batches: three days + the redelivery), shredded
    // and fed to the gate→dedup→split chain with its cross-batch index
    val src = spark.readStream
      .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
      .text(s"$stage/*.json")
    val q = CorpusStream.cleanStream(toDocs(src), s"$base/idx", s"$base/out",
        s"$base/ck", nBuckets = 8)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamRows = rows(spark.read.parquet(s"$base/out"))

    // BATCH TWIN on the same staged bytes (redelivery included). Like
    // every consumer of `documents`, CorpusPipeline.clean expects a
    // doc_id-KEYED relation — a duplicated row would double the token
    // stream and with it the logit — so the twin applies the same set
    // semantics cleanStream's per-batch dropDuplicates applies.
    val batchLines = spark.read.text(s"$stage/*.json")
    val batchDocs = toDocs(batchLines).dropDuplicates("doc_id")
    val batchRows = rows(CorpusPipeline.clean(batchDocs))
    assert(streamRows === batchRows,
      "stream-composed clean corpus diverges from the batch pipeline")

    // golden counts: the unload is deterministic at sf0.01
    val nLines = batchLines.count()
    val nDistinctDocs = batchDocs.select("doc_id").distinct().count()
    assert(nLines > nDistinctDocs,
      "fixture must contain genuine exact duplicates (route repeats + redelivery)")
    assert(streamRows.nonEmpty && streamRows.size === batchRows.size)
    assert(streamRows.size < nDistinctDocs,
      "quality gate must have dropped something")

    // 4. SERVE: BM25 index built over the STREAM's kept docs, queried —
    // answers must be bit-identical to ad-hoc scoring over the BATCH
    // twin's kept docs (same logical corpus ⇒ same df/idf/tf chain)
    val keptStream = spark.read.parquet(s"$base/out")
      .select("doc_id", "text")
    Bm25.buildIndex(keptStream, "doc_id", "text", s"$base/bm25", nBuckets = 16)
    val someTok = batchRows.head._3.split(" ").head
    val queries = Seq((0L, "Subscriber ALGERIA"), (1L, "Customer FRANCE"),
      (2L, someTok))
    val viaStreamIndex = served(Bm25.servedTopK(spark, s"$base/bm25", queries, 5))
    val viaBatch = served(Bm25.topK(
      CorpusPipeline.clean(batchDocs).select("doc_id", "text").distinct(),
      "doc_id", "text", queries, 5))
    assert(viaStreamIndex === viaBatch,
      "served retrieval over the stream-built corpus diverges from the batch path")
    assert(viaStreamIndex.nonEmpty, "the served queries must match documents")
  }
}
