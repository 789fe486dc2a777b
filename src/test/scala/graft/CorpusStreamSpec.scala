package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CorpusPipeline, QualityModel}
import graft.streaming.CorpusStream

/** Streaming corpus-pipeline parity: quality gate + CROSS-BATCH exact
  * dedup + split over a document stream must equal the batch
  * `CorpusPipeline.clean` on the union, whether the docs arrive in one
  * micro-batch or chopped — under id-ordered delivery (the documented
  * parity condition).
  */
class CorpusStreamSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // planted fixture with cross-chop duplicates: 2/12 share text across
  // the first/second file, 21/22 share text within the third
  private val fileA = Seq(
    (1L, "web", "spark table merge window batch"),
    (2L, "web", "vector data query slow plan"),
    (3L, "books", "customer orders lineitem region nation"),
    (4L, "code", "the quick brown fox jumps"))
  private val fileB = Seq(
    (11L, "web", "supplier part orders pipeline stage"),
    (12L, "books", "vector data query slow plan"),
    (13L, "web", "window function rank dense"))
  private val fileC = Seq(
    (21L, "code", "broadcast join shuffle partition skew"),
    (22L, "code", "broadcast join shuffle partition skew"),
    (23L, "web", "stream batch checkpoint replay exactly"))
  private val all = fileA ++ fileB ++ fileC

  private lazy val threshold: Long = {
    val logits = QualityModel
      .scoreDerived(all.toDF("doc_id", "source", "text"), "doc_id", "text", 1024)
      .collect().map(_.getLong(1)).sorted
    logits(logits.length / 2) // median: gate drops roughly half
  }

  private type Row6 = (Long, String, String, Long, Long, String)
  private def rows(df: org.apache.spark.sql.DataFrame): Set[Row6] =
    df.select("doc_id", "source", "text", "logit", "n_tokens", "split")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
      .toSet

  private lazy val batchTwin: Set[Row6] =
    rows(CorpusPipeline.clean(all.toDF("doc_id", "source", "text"),
      threshold = threshold))

  private val schema = StructType(Seq(StructField("doc_id", LongType),
    StructField("source", StringType), StructField("text", StringType)))

  private def run(files: Seq[Seq[(Long, String, String)]],
      onePer: Boolean): Set[Row6] = {
    val srcDir = Files.createTempDirectory("graft_cs_src").toString
    val base = Files.createTempDirectory("graft_cs").toString
    files.zipWithIndex.foreach { case (rs, i) =>
      rs.toDF("doc_id", "source", "text").coalesce(1)
        .write.mode("overwrite").parquet(s"$srcDir/f$i")
      new java.io.File(s"$srcDir/f$i").listFiles()
        .foreach(f => f.setLastModified(1700000000000L + i * 60000L))
    }
    val src0 = spark.readStream.schema(schema)
    val src = (if (onePer) src0.option("maxFilesPerTrigger", "1") else src0)
      .option("latestFirst", "false").parquet(s"$srcDir/*")
    val q = CorpusStream.cleanStream(src, s"$base/idx", s"$base/out",
        s"$base/ck", threshold = threshold, nBuckets = 8)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    rows(spark.read.parquet(s"$base/out"))
  }

  test("single-batch stream equals the batch pipeline") {
    assert(batchTwin.nonEmpty && batchTwin.size < all.size,
      s"degenerate fixture: ${batchTwin.size} of ${all.size} survive")
    assert(run(Seq(all), onePer = false) === batchTwin)
  }

  test("chopped stream (cross-batch duplicate) equals the batch pipeline") {
    assert(run(Seq(fileA, fileB, fileC), onePer = true) === batchTwin)
  }

  test("duplicated rows within a batch do not corrupt decisions") {
    assert(run(Seq(all ++ fileA), onePer = false) === batchTwin)
  }

  test("the index stays bounded: one row per kept doc") {
    val srcDir = Files.createTempDirectory("graft_cs2_src").toString
    val base = Files.createTempDirectory("graft_cs2").toString
    all.toDF("doc_id", "source", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$srcDir/f0")
    val src = spark.readStream.schema(schema).parquet(s"$srcDir/*")
    val q = CorpusStream.cleanStream(src, s"$base/idx", s"$base/out",
        s"$base/ck", threshold = threshold, nBuckets = 8)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val idx = spark.read.parquet(s"$base/idx/entries")
    assert(idx.count() === batchTwin.size)
    assert(idx.select("doc_id").distinct().count() === batchTwin.size)
  }

  test("a restarted stream with a different nBuckets still sees stored duplicates") {
    val srcDir = Files.createTempDirectory("graft_cs3_src").toString
    val base = Files.createTempDirectory("graft_cs3").toString
    def deliver(rs: Seq[(Long, String, String)], name: String): Unit = {
      rs.toDF("doc_id", "source", "text").coalesce(1)
        .write.mode("overwrite").parquet(s"$srcDir/$name")
    }
    def runOnce(nBuckets: Int): Unit = {
      val src = spark.readStream.schema(schema).parquet(s"$srcDir/*")
      val q = CorpusStream.cleanStream(src, s"$base/idx", s"$base/out",
          s"$base/ck", threshold = Long.MinValue, nBuckets = nBuckets)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    deliver(fileA, "a"); runOnce(nBuckets = 8)
    // second stream misconfigured with a different modulus: the
    // persisted _meta must win, so fileA's duplicate re-delivered under
    // a NEW id is still found and dropped
    deliver(Seq((101L, "web", fileA.head._3)), "b"); runOnce(nBuckets = 32)
    val out = spark.read.parquet(s"$base/out")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!out.contains(101L), "stored duplicate missed after nBuckets change")
    assert(out.contains(fileA.head._1))
  }
}
