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

  test("a quantized IVF store serves every path; appends stay quantized") {
    import graft.operators.IvfIndex
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(10, 16)((rnd.nextDouble() * 2 - 1).toFloat)
    val vecs = for (c <- 0 until 10; i <- 0 until 30) yield {
      val v = centers(c).map(x => x + (rnd.nextDouble() * 0.1 - 0.05).toFloat)
      ((c * 30 + i).toLong, v)
    }
    import spark.implicits._
    val planted = vecs.toDF("vec_id", "embedding").cache()
    val qs = (0 until 10).map(c => (c * 30).toLong)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    val built = IvfIndex.build(planted, nlist = 10)
    val floatDir = java.nio.file.Files.createTempDirectory("graft_qivf_f").toString
    val quantDir = java.nio.file.Files.createTempDirectory("graft_qivf_q").toString
    IvfIndex.save(built, floatDir)
    // quantized store saved with HALF the corpus, grown by append —
    // exercises the quantize-the-delta path too
    IvfIndex.saveQuantized(IvfIndex.BuiltIvf(
      built.assigned.filter(col("vec_id") < 150L), built.centers), quantDir)
    IvfIndex.appendToSaved(spark, quantDir, planted.filter(col("vec_id") >= 150L))
    assert(spark.read.parquet(s"$quantDir/assigned").columns.contains("qvec"),
      "append forked the quantized store back to float")

    val fl = IvfIndex.load(spark, floatDir)
    val qz = IvfIndex.load(spark, quantDir)
    val exactPairs = pairs(IvfIndex.searchPrebuilt(fl, qs, 5, nprobe = 2))
    val quantPairs = pairs(IvfIndex.searchPrebuilt(qz, qs, 5, nprobe = 2))
    val recall = (exactPairs & quantPairs).size.toDouble / exactPairs.size
    assert(recall >= 0.9, s"quantized-store recall $recall")
    // the pointer serving path runs against the dequantized view too
    assert(pairs(IvfIndex.searchPruned(qz, qs.take(3), 5, nprobe = 2)).nonEmpty)
    // (the on-disk ratio is pinned by the single-file test below — at
    // this fixture's 30-rows-per-cell-file scale, parquet per-file
    // metadata swamps the data and the ratio is unmeasurable)
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

  // ---- scalar-quantile codebook (n9's PQ tier) ----------------------

  private lazy val nDims =
    emb.select(size(col("embedding"))).first().getInt(0)

  test("sq codebook: 16 sorted anchors per dim, each an actual data value") {
    val cb = Quantization.sqCodebook(emb).collect()
    val dims = cb.map(_.getInt(0)).distinct.sorted
    assert(dims.length === nDims && cb.length === nDims * 16)
    val vals = emb.select(explode(col("embedding")).as("v"))
      .select(col("v").cast("double"))
      .collect().map(_.getDouble(0)).toSet
    cb.foreach(r => assert(vals.contains(r.getDouble(2)),
      s"anchor ${r.getDouble(2)} is not a data value"))
    // per dim, anchors nondecreasing in level (equal-frequency order)
    cb.groupBy(_.getInt(0)).foreach { case (_, rows) =>
      val byL = rows.sortBy(_.getInt(1)).map(_.getDouble(2))
      assert(byL.zip(byL.tail).forall { case (a, b) => a <= b })
    }
  }

  test("sq encode/decode: packed bytes round-trip, anchors encode to themselves") {
    val cb = Quantization.sqCodebook(emb)
    val codes = Quantization.sqEncode(emb, cb)
    // dims/2 bytes per vector (0.5 byte/dim; 32 for this 64-dim table)
    assert(codes.select(size(col("codes"))).distinct().collect()
      .map(_.getInt(0)).toSeq === Seq(nDims / 2))
    val rec = Quantization.sqDecode(codes, cb)
    // decoding and re-encoding is a fixed point (codes are stable)
    val codes2 = Quantization.sqEncode(rec, cb)
    assert(codes.join(codes2.withColumnRenamed("codes", "c2"), "vec_id")
      .filter(expr("codes <> c2")).count() === 0L)
    // every reconstructed component is an anchor of its dimension
    val anchors = cb.collect().groupBy(_.getInt(0))
      .view.mapValues(_.map(r => r.getDouble(2).toFloat).toSet).toMap
    rec.select(posexplode(col("embedding"))).collect().foreach { r =>
      assert(anchors(r.getInt(0)).contains(r.getFloat(1)))
    }
  }

  test("sq ADC neighborhoods overlap the exact top-10 (>= 0.5 at 8x compression)") {
    val ids = (0L until 10L)
    val cb = Quantization.sqCodebook(emb)
    val rec = Quantization.sqDecode(Quantization.sqEncode(emb, cb), cb)
    val queries = emb.filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val adc = SimilarityOps.topKCosineAgainst(rec, queries, 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = SimilarityOps.topKCosineWindow(emb, ids, 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val overlap = (exact & adc).size.toDouble / exact.size
    assert(overlap >= 0.5, s"ADC overlap $overlap")
  }

  test("served SQ store reconstructs bit-identically to the ad-hoc chain") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sq_spec").toString
    Quantization.saveSq(emb, dir)
    val served = Quantization.loadSq(spark, dir)
    val cb = Quantization.sqCodebook(emb)
    val adhoc = Quantization.sqDecode(Quantization.sqEncode(emb, cb), cb)
    // exact frame equality both ways (embedding arrays compare element-wise)
    assert(served.exceptAll(adhoc).isEmpty && adhoc.exceptAll(served).isEmpty)
    // and the persisted codes really are the compact tier: dims/2 tinyints
    val codes = spark.read.parquet(s"$dir/codes")
    assert(codes.select(size(col("codes"))).distinct().collect()
      .map(_.getInt(0)).toSeq === Seq(nDims / 2))
  }
}
