package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MultimodalOps

class MultimodalSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("binaryFile source round-trips opaque payloads (S4-style listing + content)") {
    val dir = Files.createTempDirectory("graft_media").toString
    val payloads = Map(
      "a.bin" -> Array[Byte](1, 2, 3, -1, 0, 127),
      "b.bin" -> "opaque media bytes".getBytes("UTF-8"))
    payloads.foreach { case (name, bytes) =>
      Files.write(java.nio.file.Paths.get(dir, name), bytes)
    }
    val read = spark.read.format("binaryFile").load(dir)
      .select(element_at(split(col("path"), "/"), -1).as("name"),
        col("length"), col("content"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("content")).toMap
    assert(read.keySet === payloads.keySet)
    payloads.foreach { case (n, bytes) => assert(read(n).sameElements(bytes), n) }
  }

  test("decode stub emits typed metadata consistent with the payload") {
    val media = MultimodalOps.withPayload(Tables.load(spark, sf, "documents"))
    val meta = MultimodalOps.decode(spark, media).toDF()
    val joined = meta.join(
      Tables.load(spark, sf, "documents").select(col("doc_id"),
        length(col("text")).as("n_chars")), "doc_id")
    assert(joined.filter(col("byte_len") =!= col("n_chars")).count() === 0)
    assert(joined.filter(col("n_frames") < 1 || col("n_frames") > 30).count() === 0)
    assert(joined.filter(col("width") < 64 || col("height") < 64).count() === 0)
  }

  test("frame sampling yields ceil(n_frames/step) in-bounds slices per doc") {
    val media = MultimodalOps.withPayload(Tables.load(spark, sf, "documents"))
    val frames = MultimodalOps.frameSample(media, step = 4)
    val counts = frames.groupBy("doc_id").agg(count(lit(1)).as("n"),
      max("frame_idx").as("max_idx"))
    // every sampled index is a multiple of the step
    assert(frames.filter(col("frame_idx") % 4 =!= 0).count() === 0)
    // frame payloads are exactly 8 bytes
    assert(frames.filter(octet_length(col("frame_payload")) =!= 8).count() === 0)
    assert(counts.filter(col("n") < 1).count() === 0)
  }

  test("resize stub emits exactly-sized deterministic payloads") {
    val media = MultimodalOps.withPayload(Tables.load(spark, sf, "documents"))
    val resized = MultimodalOps.resize(spark, media, targetBytes = 64)
    assert(resized.filter(octet_length(col("resized")) =!= 64).count() === 0)
    assert(resized.count() === media.count())
    // deterministic: same input, same bytes
    val a = MultimodalOps.resize(spark, media, 64).orderBy("doc_id")
      .collect().map(_.getAs[Array[Byte]]("resized").toSeq)
    val b = MultimodalOps.resize(spark, media, 64).orderBy("doc_id")
      .collect().map(_.getAs[Array[Byte]]("resized").toSeq)
    assert(a.toSeq === b.toSeq)
    // a short payload is zero-padded to size
    assert(MultimodalOps.resizeBytes("ab".getBytes, 8).toSeq ===
      Seq[Byte]('a', 'b', 0, 0, 0, 0, 0, 0))
  }

  test("fake features are deterministic and in [0, 1)") {
    val media = MultimodalOps.withPayload(Tables.load(spark, sf, "documents"))
    val f1 = MultimodalOps.fakeFeatures(media).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val f2 = MultimodalOps.fakeFeatures(media).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(f1 === f2)
    assert(f1.values.flatten.forall(v => v >= 0.0 && v < 1.0))
  }
}
