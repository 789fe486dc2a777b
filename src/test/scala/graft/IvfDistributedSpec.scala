package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IvfIndex, SimilarityOps}

/** The distributed-fit IVF build: centroids from the fixed-point
  * Lloyd (`KMeans.fit`), everything downstream unchanged — served
  * search over planted clusters must return the exact brute-force
  * neighbourhoods, and the assignment must be the true nearest
  * centroid.
  */
class IvfDistributedSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // 8 well-separated planted clusters of 30, dim 16 (the AnnStreamSpec
  // generator shape): within-cluster noise is tiny next to the
  // center spacing, so every true top-5 neighbourhood lives inside one
  // cluster and an nprobe=2 probed search must recover it exactly.
  private lazy val planted = {
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(8, 16)((rnd.nextDouble() * 4 - 2).toFloat)
    val vecs = for (c <- 0 until 8; i <- 0 until 30) yield {
      val v = centers(c).map(x => x + (rnd.nextDouble() * 0.05 - 0.025).toFloat)
      ((c * 30 + i).toLong, v)
    }
    vecs.toDF("vec_id", "embedding").cache()
  }

  test("assignment lands every vector on its true nearest centroid") {
    val idx = IvfIndex.buildDistributed(planted, nlist = 8, dims = 16)
    val cents = idx.centers.toMap
    def d2(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    idx.assigned.collect().foreach { r =>
      val v = r.getSeq[Float](1).toArray
      val cell = r.getInt(2)
      val best = cents.minBy { case (_, c) => d2(v, c) }._1
      // ties are impossible on this data (continuous noise)
      assert(cell === best,
        s"vec ${r.getLong(0)} assigned to $cell, nearest centroid is $best")
    }
  }

  test("served search over the distributed-fit index is exact on planted clusters") {
    val idx = IvfIndex.buildDistributed(planted, nlist = 8, dims = 16)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_dist").toString
    IvfIndex.save(idx, dir)
    val loaded = IvfIndex.load(spark, dir)
    val queryIds = Seq(0L, 35L, 70L, 130L, 200L)
    val exact = SimilarityOps.topKCosineWindow(planted, queryIds, 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val served = IvfIndex.searchPrunedDf(loaded,
        spark.createDataset(queryIds).toDF("query_id"), 5, nprobe = 2)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(served === exact,
      "distributed-fit IVF lost a true neighbour on well-separated clusters")
  }
}
