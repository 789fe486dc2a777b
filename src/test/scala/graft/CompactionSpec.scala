package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Compaction, IvfIndex}

class CompactionSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def dataFiles(dir: String, part: String): Seq[java.io.File] = {
    val d = new java.io.File(dir, part)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.startsWith("part-")).toSeq
  }

  test("only hot partitions are rewritten; content identical; cold files untouched") {
    val dir = tmp("graft_compact")
    // 5 appends into b=0 (hot), one into b=1 (cold)
    (0 until 5).foreach { i =>
      Seq((i.toLong, 0)).toDF("v", "b")
        .write.mode("append").partitionBy("b").parquet(dir)
    }
    Seq((100L, 1)).toDF("v", "b")
      .write.mode("append").partitionBy("b").parquet(dir)

    val before = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val coldMtimes = dataFiles(dir, "b=1").map(f => f.getName -> f.lastModified).toMap
    assert(dataFiles(dir, "b=0").size === 5)

    val rewritten = Compaction.compact(spark, dir, "b", maxFiles = 2)
    assert(rewritten === Seq("0"))
    assert(dataFiles(dir, "b=0").size === 1, "hot partition not compacted to one file")
    assert(dataFiles(dir, "b=1").map(f => f.getName -> f.lastModified).toMap
      === coldMtimes, "cold partition files were touched")
    val after = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(after === before)

    // below threshold now: another pass is a pure listing no-op
    assert(Compaction.compact(spark, dir, "b", maxFiles = 2) === Seq.empty)
  }

  test("dropExactDuplicates collapses a crash-replayed append") {
    val dir = tmp("graft_compact_dup")
    val batch = Seq((1L, 0), (2L, 0), (3L, 0)).toDF("v", "b")
    batch.write.mode("append").partitionBy("b").parquet(dir)
    batch.write.mode("append").partitionBy("b").parquet(dir) // the replay
    assert(spark.read.parquet(dir).count() === 6)
    Compaction.compact(spark, dir, "b", maxFiles = 1, dropExactDuplicates = true)
    val rows = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(rows.size === 3 && rows.toSet.size === 3)
  }

  test("a compacted grown IVF index serves identically with fewer files") {
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(6, 16)((rnd.nextDouble() * 2 - 1).toFloat)
    val vecs = for (c <- 0 until 6; i <- 0 until 20) yield {
      val v = centers(c).map(x => x + (rnd.nextDouble() * 0.1 - 0.05).toFloat)
      ((c * 20 + i).toLong, v)
    }
    val corpus = vecs.toDF("vec_id", "embedding").cache()
    val dir = tmp("graft_compact_ivf")
    val built = IvfIndex.build(corpus.filter(col("vec_id") < 40L), nlist = 6)
    IvfIndex.save(built, dir)
    // grow in two deltas — each append adds files to the touched cells
    IvfIndex.appendToSaved(spark, dir,
      corpus.filter(col("vec_id") >= 40L && col("vec_id") < 80L))
    IvfIndex.appendToSaved(spark, dir, corpus.filter(col("vec_id") >= 80L))

    def fileCount(sub: String): Int = {
      val root = new java.io.File(dir, sub)
      Option(root.listFiles()).getOrElse(Array.empty)
        .filter(_.isDirectory)
        .map(d => d.listFiles().count(f => f.isFile && f.getName.startsWith("part-")))
        .sum
    }
    val qs = Seq(0L, 20L, 40L, 60L, 80L, 100L)
    def served = IvfIndex.searchPruned(IvfIndex.load(spark, dir), qs, 5, nprobe = 2)
      .select("query_id", "neighbor_id", "rnk", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet

    val beforeFiles = fileCount("assigned")
    val beforeServed = served
    val rewritten = Compaction.compactIvf(spark, dir, maxFiles = 1)
    assert(rewritten.nonEmpty)
    assert(fileCount("assigned") < beforeFiles, "no files were merged")
    assert(served === beforeServed, "compaction changed results")
  }
}
