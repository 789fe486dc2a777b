package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Quantization, SimilarityOps}

class QuantizationSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val emb = Tables.load(spark, sf, "embeddings")
    .select("vec_id", "embedding")

  test("component error is bounded by scale/2 and the round trip is deterministic") {
    val q = Quantization.quantize(emb)
    val joined = Quantization.dequantize(q).withColumnRenamed("embedding", "deq")
      .join(emb, "vec_id").join(q.select("vec_id", "scale"), "vec_id")
    val violations = joined.select(
        expr("""size(filter(zip_with(embedding, deq,
                (a, b) -> abs(CAST(a AS DOUBLE) - CAST(b AS DOUBLE))),
                e -> e > scale / 2 + 1e-9)) AS v"""))
      .agg(sum("v")).first().getLong(0)
    assert(violations === 0L, "a component moved more than scale/2")
    // pure function: quantizing twice gives identical bytes
    val a = q.orderBy("vec_id").collect().map(_.toString)
    val b = Quantization.quantize(emb).orderBy("vec_id").collect().map(_.toString)
    assert(a.toSeq === b.toSeq)
  }

  test("top-10 cosine neighborhoods survive quantization (>= 0.9 overlap)") {
    val ids = (0L until 10L)
    def topk(e: org.apache.spark.sql.DataFrame) =
      SimilarityOps.topKCosineWindow(e, ids, 10)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = topk(emb)
    val quant = topk(Quantization.dequantize(Quantization.quantize(emb)))
    val overlap = (exact & quant).size.toDouble / exact.size
    assert(overlap >= 0.9, s"neighborhood overlap $overlap")
  }

  test("quantized parquet is under half the float footprint") {
    def bytesOf(write: String => Unit): Long = {
      val dir = java.nio.file.Files.createTempDirectory("graft_quant").toString
      write(dir)
      new java.io.File(dir).listFiles()
        .filter(f => f.getName.startsWith("part-")).map(_.length()).sum
    }
    val floatBytes = bytesOf(d =>
      emb.coalesce(1).write.mode("overwrite").parquet(d))
    val quantBytes = bytesOf(d =>
      Quantization.quantize(emb).coalesce(1).write.mode("overwrite").parquet(d))
    assert(quantBytes * 2 < floatBytes,
      s"quantized $quantBytes vs float $floatBytes")
  }
}
