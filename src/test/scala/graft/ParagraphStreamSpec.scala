package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupOps
import graft.streaming.ParagraphStream

/** Streaming paragraph-dedup parity: cross-batch segment-level dedup
  * over a document stream must equal the batch
  * `DedupOps.paragraphDedupRewrite` on the union, whether the docs
  * arrive in one micro-batch or chopped — under id-ordered delivery
  * (the documented parity condition), plus replay immunity.
  */
class ParagraphStreamSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // 4-token segments; boilerplate block shared ACROSS the chop boundary
  // (docs 1/11), within one file (21/22 exact dup), and within one doc
  // (12's internal repeat)
  private val blockA = "a1 a2 a3 a4"
  private val fileA = Seq(
    (1L, "web", s"$blockA u1 u2 u3 u4"),
    (2L, "web", "v1 v2 v3 v4 v5 v6"),
    (3L, "books", "w1 w2 w3"))
  private val fileB = Seq(
    (11L, "web", s"$blockA x1 x2 x3 x4"),
    (12L, "code", "y1 y2 y3 y4 y1 y2 y3 y4"))
  private val fileC = Seq(
    (21L, "code", "z1 z2 z3 z4 z5 z6 z7 z8"),
    (22L, "code", "z1 z2 z3 z4 z5 z6 z7 z8"))
  private val all = fileA ++ fileB ++ fileC

  private type R = (Long, Long, Long, String)
  private def norm(rows: Array[org.apache.spark.sql.Row]): Set[R] =
    rows.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_segs"),
      r.getAs[Long]("n_kept"), r.getAs[String]("text_clean"))).toSet

  private lazy val batchTwin: Set[R] =
    norm(DedupOps.paragraphDedupRewrite(
      all.toDF("doc_id", "source", "text"), "doc_id", "text", segTokens = 4)
      .collect())

  private val schema = StructType(Seq(StructField("doc_id", LongType),
    StructField("source", StringType), StructField("text", StringType)))

  private def run(files: Seq[Seq[(Long, String, String)]],
      onePer: Boolean): (Set[R], String) = {
    val srcDir = Files.createTempDirectory("graft_ps_src").toString
    val base = Files.createTempDirectory("graft_ps").toString
    files.zipWithIndex.foreach { case (rs, i) =>
      rs.toDF("doc_id", "source", "text").coalesce(1)
        .write.mode("overwrite").parquet(s"$srcDir/f$i")
      new java.io.File(s"$srcDir/f$i").listFiles()
        .foreach(f => f.setLastModified(1700000000000L + i * 60000L))
    }
    val src0 = spark.readStream.schema(schema)
    val src = (if (onePer) src0.option("maxFilesPerTrigger", "1") else src0)
      .option("latestFirst", "false").parquet(s"$srcDir/*")
    val q = ParagraphStream.cleanStream(src, s"$base/idx", s"$base/out",
        s"$base/ck", segTokens = 4, nBuckets = 8)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    (norm(spark.read.parquet(s"$base/out").collect()), base)
  }

  test("single-batch stream equals the batch rewrite") {
    val (got, _) = run(Seq(all), onePer = false)
    assert(got === batchTwin)
  }

  test("chopped stream with cross-batch duplicates equals the batch rewrite") {
    val (got, _) = run(Seq(fileA, fileB, fileC), onePer = true)
    assert(got === batchTwin)
    // the planted cases actually exercised: 11 lost blockA to 1,
    // 22 emptied against 21, 12's internal repeat collapsed
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(11L)._4 === "x1 x2 x3 x4")
    assert(byId(22L)._4 === "")
    assert(byId(12L)._4 === "y1 y2 y3 y4")
  }

  test("index holds one row per kept occurrence; replay does not flip decisions") {
    val (got, base) = run(Seq(fileA, fileB, fileC), onePer = true)
    val idx = spark.read.parquet(s"$base/idx/entries")
    val keptOcc = got.toSeq.map(_._3).sum
    assert(idx.count() === keptOcc, "index rows != kept occurrences")
    // replay fileC's batch against the grown index by hand: decisions
    // for docs 21/22 must reproduce (21 keeps both segments via
    // self-exclusion, 22 is cut by 21's foreign entries)
    import org.apache.spark.sql.functions._
    val seg = DedupOps.segments(fileC.toDF("doc_id", "source", "text"),
        "doc_id", "text", 4)
      .withColumn("h", md5(col("seg")))
      .withColumn("okey", col("doc_id") * 1000000L + col("seg_idx"))
    val owners = seg.groupBy("h").agg(min("okey").as("bokey"))
    val bk = seg.join(owners, "h").filter(col("okey") === col("bokey"))
    val replay = bk.join(idx.select(col("h"), col("okey").as("_old")),
        Seq("h"), "left")
      .groupBy("doc_id", "seg_idx")
      .agg(min(when(expr("_old div 1000000L") =!= col("doc_id"), col("_old")))
        .as("_foreign"))
      .filter(col("_foreign").isNull)
      .select("doc_id").collect().map(_.getLong(0))
    assert(replay.toSet === Set(21L), s"replay kept ${replay.toSet}")
  }
}
