package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IvfPq, KMeans}
import graft.streaming.PqStream

/** The IVF-PQ stream→compact→serve lifecycle: streamed cell-codes
  * match the batch encoder under any chopping, compaction rewrites the
  * per-batch partitions into the cell layout WITHOUT changing content,
  * the compacted store serves search identically to the ad-hoc chain,
  * and a cell-filtered read of the compacted store is file-pruned.
  */
class IvfPqStreamSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    .select("vec_id", "embedding")
  private lazy val cents = KMeans.fit(emb, k = 4, iters = 2)
  private lazy val books = IvfPq.fit(emb, cents, m = 4, k = 4, iters = 2)

  private lazy val rows: Seq[(Long, Array[Float])] =
    emb.collect().toSeq.sortBy(_.getLong(0))
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

  private val schema = StructType(Seq(StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  private def cols = Seq("vec_id", "cell", "c0", "c1", "c2", "c3", "err2")

  private def stream(files: Seq[Seq[(Long, Array[Float])]]): String = {
    val srcDir = Files.createTempDirectory("graft_ipqs_src").toString
    val base = Files.createTempDirectory("graft_ipqs").toString
    files.zipWithIndex.foreach { case (rs, i) =>
      rs.toDF("vec_id", "embedding").coalesce(1)
        .write.mode("overwrite").parquet(s"$srcDir/f$i")
      new java.io.File(s"$srcDir/f$i").listFiles()
        .foreach(f => f.setLastModified(1700000000000L + i * 60000L))
    }
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("latestFirst", "false").parquet(s"$srcDir/*")
    val q = PqStream.encodeIvf(src, cents, books, s"$base/out", s"$base/ck")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    base
  }

  test("streamed cell-codes match batch encode; compaction preserves content") {
    val base = stream(Seq(rows.take(100), rows.slice(100, 350),
      rows.drop(350) ++ rows.take(5))) // last batch re-delivers 5 rows
    val expected = IvfPq.encode(emb, cents, books)
      .select(cols.map(col): _*).collect().map(_.toString).toSet
    val streamed = spark.read.parquet(s"$base/out")
      .select(cols.map(col): _*).collect().map(_.toString).toSet
    assert(streamed === expected)
    IvfPq.compactToCells(spark, s"$base/out", s"$base/served")
    val served = spark.read.parquet(s"$base/served")
      .select(cols.map(col): _*).collect().map(_.toString).toSet
    assert(served === expected, "compaction must not change content")
  }

  test("a streaming query feed answers identically to the batch search, chopped or not") {
    val base = stream(Seq(rows))
    IvfPq.compactToCells(spark, s"$base/out", s"$base/served")
    // external queries: fresh ids (offset past the corpus), vectors
    // borrowed from the corpus — self-exclusion must be OFF, so the
    // coincident corpus row ranks first
    val qRows = rows.take(4).map { case (id, v) => (id + 1000000L, v) }
    val qSchema = StructType(Seq(StructField("query_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    def runServe(files: Seq[Seq[(Long, Array[Float])]]) = {
      val srcDir = Files.createTempDirectory("graft_ipqq_src").toString
      val sb = Files.createTempDirectory("graft_ipqq").toString
      files.zipWithIndex.foreach { case (rs, i) =>
        rs.toDF("query_id", "embedding").coalesce(1)
          .write.mode("overwrite").parquet(s"$srcDir/f$i")
        new java.io.File(s"$srcDir/f$i").listFiles()
          .foreach(f => f.setLastModified(1700000000000L + i * 60000L))
      }
      val src = spark.readStream.schema(qSchema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false").parquet(s"$srcDir/*")
      val q = PqStream.serve(src, s"$base/served", cents, books,
          s"$sb/res", s"$sb/ck", k = 5, nprobe = 2)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(s"$sb/res")
        .select("query_id", "neighbor_id", "adist2", "rnk")
        .collect().map(_.toString).toSet
    }
    val servedCodes = spark.read.parquet(s"$base/served")
    val batchQ = KMeans.quantized(
        qRows.toDF("query_id", "embedding")
          .select(col("query_id").as("vec_id"), col("embedding")))
      .select(col("vec_id").as("query_id"), col("qv"))
    val expected = IvfPq.search(servedCodes, batchQ, cents, books,
        nprobe = 2, k = 5, excludeSelf = false)
      .select("query_id", "neighbor_id", "adist2", "rnk")
      .collect().map(_.toString).toSet
    // the coincident corpus member must surface at distance 0
    assert(expected.nonEmpty)
    assert(runServe(Seq(qRows)) === expected)
    assert(runServe(Seq(qRows.take(2), qRows.drop(2))) === expected,
      "chopping the query stream must not change any answer")
  }

  test("the compacted store serves search identically and prunes by cell") {
    val base = stream(Seq(rows))
    IvfPq.compactToCells(spark, s"$base/out", s"$base/served")
    val servedCodes = spark.read.parquet(s"$base/served")
    val queries = KMeans.quantized(emb).filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("qv"))
    val viaServed = IvfPq.search(servedCodes, queries, cents, books,
      nprobe = 2, k = 10).collect().map(_.toString).toSeq
    val adHoc = IvfPq.search(IvfPq.encode(emb, cents, books), queries,
      cents, books, nprobe = 2, k = 10).collect().map(_.toString).toSeq
    assert(viaServed === adHoc)
    // file-level pruning: a cell-filtered scan reads fewer files than
    // the full store holds (partition pruning on the cell directory)
    val allFiles = servedCodes.select(input_file_name()).distinct().count()
    val oneCell = spark.read.parquet(s"$base/served")
      .filter(col("cell") === 0)
      .select(input_file_name()).distinct().count()
    assert(allFiles >= 4 && oneCell < allFiles,
      s"cell filter must prune files: $oneCell of $allFiles")
  }
}
