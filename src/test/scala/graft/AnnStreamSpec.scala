package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IvfIndex
import graft.streaming.AnnStream

/** Streaming ANN serving parity: query vectors streamed against a saved
  * index — in one micro-batch or chopped one file per trigger — must
  * answer exactly like the batch serving path on the same queries.
  */
class AnnStreamSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val planted = {
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(10, 16)((rnd.nextDouble() * 2 - 1).toFloat)
    val vecs = for (c <- 0 until 10; i <- 0 until 30) yield {
      val v = centers(c).map(x => x + (rnd.nextDouble() * 0.1 - 0.05).toFloat)
      ((c * 30 + i).toLong, v)
    }
    vecs.toDF("vec_id", "embedding").cache()
  }

  // external query vectors: corpus points nudged, ids disjoint from the
  // corpus (1000+) so excludeSelf=false has no collisions to hide
  private lazy val queryVecs: Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(3)
    planted.collect().toSeq.sortBy(_.getLong(0)).take(12).map { r =>
      (1000L + r.getLong(0),
        r.getSeq[Float](1).toArray.map(x => x + (rnd.nextFloat() * 0.02f - 0.01f)))
    }
  }

  private def results(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int, Double)] =
    df.select("query_id", "neighbor_id", "rnk", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet

  test("streamed serving equals batch serving under any chopping") {
    val dir = Files.createTempDirectory("graft_ann_idx").toString
    IvfIndex.save(IvfIndex.build(planted, nlist = 10), dir)
    val loaded = IvfIndex.load(spark, dir)
    val expected = results(IvfIndex.searchPrunedVecsDf(loaded,
      queryVecs.toDF("query_id", "qe"), 5, nprobe = 2, excludeSelf = false))
    assert(expected.size === queryVecs.size * 5, "batch reference is not full top-5")

    val qSchema = StructType(Seq(StructField("query_id", LongType),
      StructField("qe", ArrayType(FloatType))))
    def run(files: Seq[Seq[(Long, Array[Float])]], onePer: Boolean) = {
      val srcDir = Files.createTempDirectory("graft_ann_src").toString
      val base = Files.createTempDirectory("graft_ann").toString
      files.zipWithIndex.foreach { case (rows, i) =>
        rows.toDF("query_id", "qe").coalesce(1)
          .write.mode("overwrite").parquet(s"$srcDir/f$i")
        new java.io.File(s"$srcDir/f$i").listFiles()
          .foreach(f => f.setLastModified(1700000000000L + i * 60000L))
      }
      val src0 = spark.readStream.schema(qSchema)
      val src = (if (onePer) src0.option("maxFilesPerTrigger", "1") else src0)
        .option("latestFirst", "false").parquet(s"$srcDir/*")
      val q = AnnStream.serve(src, dir, s"$base/out", s"$base/ck", 5, nprobe = 2)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      results(spark.read.parquet(s"$base/out"))
    }
    assert(run(Seq(queryVecs), onePer = false) === expected,
      "single-batch stream diverged from batch serving")
    assert(run(Seq(queryVecs.take(5), queryVecs.slice(5, 9), queryVecs.drop(9)),
      onePer = true) === expected,
      "chopped stream diverged from batch serving")
    // at-least-once delivery: a query duplicated WITHIN a batch must not
    // double its candidate set (review r10 — without the per-batch
    // dedup, row_number ranked every true neighbour twice and the top-k
    // held only ⌈k/2⌉ distinct results)
    assert(run(Seq(queryVecs ++ queryVecs.take(3)), onePer = false) === expected,
      "duplicated query rows corrupted the top-k")
  }

  test("streamed serving over an int8-quantized store matches its own batch path") {
    // load() rebuilds the embedding column lazily for a quantized store,
    // so the stream serves against it unchanged; parity is against the
    // SAME store's batch path (quantization is lossy vs the float store
    // by design — recall vs float is QuantizationSpec's contract)
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_qidx").toString
    IvfIndex.saveQuantized(IvfIndex.build(planted, nlist = 10), dir)
    val loaded = IvfIndex.load(spark, dir)
    val expected = results(IvfIndex.searchPrunedVecsDf(loaded,
      queryVecs.toDF("query_id", "qe"), 5, nprobe = 2, excludeSelf = false))

    val srcDir = java.nio.file.Files.createTempDirectory("graft_annq_src").toString
    val base = java.nio.file.Files.createTempDirectory("graft_annq").toString
    queryVecs.toDF("query_id", "qe").coalesce(1)
      .write.mode("overwrite").parquet(s"$srcDir/f0")
    val qSchema = StructType(Seq(StructField("query_id", LongType),
      StructField("qe", ArrayType(FloatType))))
    val src = spark.readStream.schema(qSchema).parquet(s"$srcDir/*")
    val q = AnnStream.serve(src, dir, s"$base/out", s"$base/ck", 5, nprobe = 2)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(results(spark.read.parquet(s"$base/out")) === expected,
      "quantized-store stream diverged from its batch path")
  }
}
