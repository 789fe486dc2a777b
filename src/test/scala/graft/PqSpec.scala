package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{KMeans, PqIndex}

/** Behavior spec for product quantization — planted per-subspace
  * structure from first principles plus the contracts the oracle hash
  * can't express alone: map-side encoding (no exchange in the plan),
  * zero reconstruction error on codeword-coincident vectors, ADC
  * agreement with the exact distance on the reconstructions, and
  * served-tier bit-identity.
  */
class PqSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  /** dims = 4, m = 2 subspaces of 2 dims. The FIRST half of each vector
    * sits near (1,1) or (-1,-1); the SECOND half near (2,0) or (0,2) —
    * independently of the first, so the 4 planted combinations exercise
    * the product structure (2 codebooks × 2 codewords = 4 code pairs,
    * which ONE flat 2-codeword quantizer could never represent).
    */
  private def planted = Seq(
    (0L, Array(1.00f, 1.00f, 2.00f, 0.00f)),
    (1L, Array(1.01f, 0.99f, 0.00f, 2.00f)),
    (2L, Array(-1.00f, -1.00f, 2.01f, 0.01f)),
    (3L, Array(-0.99f, -1.01f, 0.01f, 1.99f)),
    (4L, Array(1.02f, 1.01f, 1.99f, -0.01f)),
    (5L, Array(-1.01f, -0.99f, -0.01f, 2.01f))
  ).toDF("vec_id", "embedding")

  test("planted product structure is recovered: subspace codes vary independently") {
    val books = PqIndex.fit(planted, m = 2, k = 2, iters = 3, dims = 4)
    val codes = PqIndex.encode(planted, books, dims = 4)
      .orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    // first subspace separates {0,1,4} from {2,3,5}
    assert(Set(codes(0L)._1, codes(1L)._1, codes(4L)._1).size === 1)
    assert(Set(codes(2L)._1, codes(3L)._1, codes(5L)._1).size === 1)
    assert(codes(0L)._1 !== codes(2L)._1)
    // second subspace separates {0,2,4} from {1,3,5} — CROSSING the first
    assert(Set(codes(0L)._2, codes(2L)._2, codes(4L)._2).size === 1)
    assert(Set(codes(1L)._2, codes(3L)._2, codes(5L)._2).size === 1)
    assert(codes(0L)._2 !== codes(1L)._2)
  }

  test("a vector equal to its codewords reconstructs with err2 = 0") {
    // k = n distinct sub-vectors per subspace: after enough rounds each
    // sub-vector IS a codeword, so every reconstruction is exact.
    val tiny = Seq(
      (0L, Array(1f, 2f, 3f, 4f)),
      (1L, Array(-1f, -2f, -3f, -4f))
    ).toDF("vec_id", "embedding")
    val books = PqIndex.fit(tiny, m = 2, k = 2, iters = 2, dims = 4)
    val errs = PqIndex.encode(tiny, books, dims = 4)
      .select("err2").as[Long].collect()
    assert(errs.forall(_ === 0L), s"expected exact reconstruction, got ${errs.toSeq}")
  }

  test("encoding is map-side: no Exchange in the physical plan") {
    val books = PqIndex.fit(planted, m = 2, k = 2, iters = 1, dims = 4)
    val plan = PqIndex.encode(planted, books, dims = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode must not shuffle:\n$plan")
  }

  test("ADC distance equals the exact distance to the reconstruction") {
    val books = PqIndex.fit(planted, m = 2, k = 2, iters = 3, dims = 4)
    val codes = PqIndex.encode(planted, books, dims = 4)
    val queries = KMeans.quantized(planted)
      .filter(col("vec_id") === 0L)
      .select(col("vec_id").as("query_id"), col("qv"))
    val got = PqIndex.adcTopK(codes, queries, books, k = 5, dims = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    // recompute expected ADC driver-side: dist2(query slice, codeword)
    val qv = KMeans.quantized(planted).filter(col("vec_id") === 0L)
      .select("qv").as[Seq[Long]].first().toArray
    val codeRows = codes.orderBy("vec_id").collect()
      .map(r => (r.getLong(0), Seq(r.getInt(1), r.getInt(2))))
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    codeRows.filter(_._1 != 0L).foreach { case (vid, cs) =>
      val expected = cs.zipWithIndex.map { case (c, i) =>
        d2(qv.slice(i * 2, i * 2 + 2), books(i)(c).toArray)
      }.sum
      assert(got(vid) === expected, s"ADC mismatch for neighbor $vid")
    }
  }

  test("fit and encode are partition-invariant (the KMeans integer contract holds through PQ)") {
    val emb = planted
    val books1 = PqIndex.fit(emb, m = 2, k = 2, iters = 3, dims = 4)
    val books2 = PqIndex.fit(emb.repartition(7), m = 2, k = 2, iters = 3, dims = 4)
    assert(books1.map(_.map(_.toSeq)) === books2.map(_.map(_.toSeq)),
      "codebooks drifted under repartitioning — the integer fit must be order-independent")
    val enc1 = PqIndex.encode(emb, books1, dims = 4)
      .orderBy("vec_id").collect().map(_.toString).toSeq
    val enc2 = PqIndex.encode(emb.repartition(5), books1, dims = 4)
      .orderBy("vec_id").collect().map(_.toString).toSeq
    assert(enc1 === enc2)
  }

  test("adcTopKDf ≡ adcTopK bit-identity; no driver-built LUT rows; plan flat in batch size") {
    val books = PqIndex.fit(planted, m = 2, k = 2, iters = 3, dims = 4)
    val codes = PqIndex.encode(planted, books, dims = 4).localCheckpoint()
    val q = KMeans.quantized(planted).localCheckpoint()
    def queries(n: Int) = q.filter(col("vec_id") < n)
      .select(col("vec_id").as("query_id"), col("qv"))
    val drv = PqIndex.adcTopK(codes, queries(3), books, k = 4, dims = 4)
      .collect().map(_.toString).toSeq
    val df = PqIndex.adcTopKDf(codes, queries(3), books, k = 4, dims = 4)
      .collect().map(_.toString).toSeq
    assert(df === drv, "adcTopKDf diverged from adcTopK")
    val plan3 = PqIndex.adcTopKDf(codes, queries(3), books, k = 4, dims = 4)
      .queryExecution.executedPlan.toString
    val plan6 = PqIndex.adcTopKDf(codes, queries(6), books, k = 4, dims = 4)
      .queryExecution.executedPlan.toString
    assert(!plan3.contains("LocalTableScan"),
      s"adcTopKDf plan contains driver-built rows:\n${plan3.take(1200)}")
    assert(plan3.length === plan6.length,
      s"plan grew with batch size: ${plan3.length} -> ${plan6.length}")
  }

  test("served tier is bit-identical to the ad-hoc chain") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_spec").toString
    PqIndex.save(planted, dir, m = 2, k = 2, iters = 3, dims = 4)
    val (codes, books) = PqIndex.load(spark, dir, dims = 4)
    val adhocBooks = PqIndex.fit(planted, m = 2, k = 2, iters = 3, dims = 4)
    assert(books.map(_.map(_.toSeq)) === adhocBooks.map(_.map(_.toSeq)))
    val adhoc = PqIndex.encode(planted, adhocBooks, dims = 4)
      .orderBy("vec_id").collect().map(_.toString).toSeq
    val served = codes.orderBy("vec_id").collect().map(_.toString).toSeq
    assert(served === adhoc)
  }
}
