package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dsir
import graft.streaming.DsirStream

/** Streaming DSIR importance gating: the pre-fit weight table makes
  * scoring per-document, so any micro-batch chopping must reproduce
  * the batch twin's integer scores exactly — and the planted
  * target-like doc must clear the gate while the junk doc is dropped.
  */
class DsirStreamSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // target slice "wiki" speaks alpha/beta/gamma; raw doc 101 mimics it,
  // 102 is junk the target never says, 103 mixes both
  private val corpus = Seq(
    (1L, "wiki", "alpha beta gamma alpha beta"),
    (2L, "wiki", "alpha gamma gamma beta"),
    (101L, "web", "alpha beta gamma delta"),
    (102L, "web", "zz yy xx ww vv uu"),
    (103L, "web", "beta beta zz alpha"))
  private val raw = corpus.filter(_._2 == "web")

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("source", StringType),
    StructField("text", StringType)))

  test("scoreBatch replays the x7 arithmetic; stream equals batch under any chopping") {
    val base = Files.createTempDirectory("graft_dsir").toString
    val wDir = s"$base/weights"
    DsirStream.fitWeights(corpus.toDF("doc_id", "source", "text"),
      "doc_id", "text", "source", Seq("wiki"), wDir)

    // 1. the persisted-weights scorer is the batch entry verbatim
    val viaX7 = Dsir.importanceScores(corpus.toDF("doc_id", "source", "text"),
        "doc_id", "text", "source", Seq("wiki"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val viaStore = DsirStream.scoreBatch(raw.toDF("doc_id", "source", "text"), wDir)
      .select("doc_id", "score_e6", "n_toks")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(viaStore === viaX7)

    // planted semantics: the target-like doc scores above zero, the
    // junk doc below — threshold 0 separates them
    val scores = viaStore.map(t => t._1 -> t._2).toMap
    assert(scores(101L) > 0L, s"target-like doc should clear the gate: $scores")
    assert(scores(102L) < 0L, s"junk doc should be dropped: $scores")

    val expectedKept = viaStore.filter(_._2 >= 0L)

    // 2. stream parity under chopping: one batch, then one-doc batches
    def run(files: Seq[Seq[(Long, String, String)]], onePer: Boolean) = {
      val srcDir = Files.createTempDirectory("graft_dsir_src").toString
      val out = Files.createTempDirectory("graft_dsir_out").toString
      files.zipWithIndex.foreach { case (rows, i) =>
        rows.toDF("doc_id", "source", "text").coalesce(1)
          .write.mode("overwrite").parquet(s"$srcDir/f$i")
        new java.io.File(s"$srcDir/f$i").listFiles()
          .foreach(f => f.setLastModified(1700000000000L + i * 60000L))
      }
      val src0 = spark.readStream.schema(docSchema)
      val src = (if (onePer) src0.option("maxFilesPerTrigger", "1") else src0)
        .option("latestFirst", "false").parquet(s"$srcDir/*")
      val q = DsirStream.importanceGate(src, wDir, s"$out/kept",
          s"$out/ck", minScoreE6 = 0L)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      DsirStream.kept(spark, s"$out/kept")
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(3))).toSet
    }
    assert(run(Seq(raw), onePer = false) === expectedKept)
    assert(run(raw.map(Seq(_)), onePer = true) === expectedKept)
  }

  test("unseen-bucket tokens weigh zero but still count toward n_toks") {
    val base = Files.createTempDirectory("graft_dsir2").toString
    val wDir = s"$base/weights"
    DsirStream.fitWeights(corpus.toDF("doc_id", "source", "text"),
      "doc_id", "text", "source", Seq("wiki"), wDir)
    // "qqqq" never occurred in the fit corpus; with dims = 1024 and a
    // tiny vocabulary its bucket is almost surely unoccupied — assert
    // that precondition, then the zero-weight rule
    val fitBuckets = spark.read.parquet(wDir).select("b")
      .collect().map(_.getLong(0)).toSet
    val qb = Seq.tabulate(1)(_ => "qqqq").toDF("token")
      .select(graft.operators.QualityModel.tokenBucket(col("token"), 1024).as("b"))
      .head().getLong(0)
    assume(!fitBuckets.contains(qb))
    val r = DsirStream.scoreBatch(
        Seq((7L, "web", "alpha qqqq")).toDF("doc_id", "source", "text"), wDir)
      .head()
    val alphaOnly = DsirStream.scoreBatch(
        Seq((8L, "web", "alpha")).toDF("doc_id", "source", "text"), wDir)
      .head()
    assert(r.getAs[Int]("n_toks") === 2)
    assert(alphaOnly.getAs[Int]("n_toks") === 1)
    assert(r.getAs[Long]("score_e6") === alphaOnly.getAs[Long]("score_e6"))
  }

  test("a crash between the swap renames self-heals: scoreBatch restores .retired") {
    val base = Files.createTempDirectory("graft_dsir3").toString
    val wDir = s"$base/weights"
    DsirStream.fitWeights(corpus.toDF("doc_id", "source", "text"),
      "doc_id", "text", "source", Seq("wiki"), wDir)
    val before = DsirStream.scoreBatch(
      Seq((9L, "web", "alpha beta")).toDF("doc_id", "source", "text"), wDir)
      .head().getAs[Long]("score_e6")
    // simulate fitWeights dying between retiring live and publishing
    // staging: live gone, old table stranded at .retired
    val fs = new org.apache.hadoop.fs.Path(wDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(wDir),
      new org.apache.hadoop.fs.Path(wDir + ".retired")))
    val after = DsirStream.scoreBatch(
      Seq((9L, "web", "alpha beta")).toDF("doc_id", "source", "text"), wDir)
      .head().getAs[Long]("score_e6")
    assert(after === before, "recovered table must score identically")
    assert(fs.exists(new org.apache.hadoop.fs.Path(wDir)) &&
      !fs.exists(new org.apache.hadoop.fs.Path(wDir + ".retired")),
      "recovery must restore live and clear .retired")
  }
}
