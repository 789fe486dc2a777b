package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IvfPq, KMeans, PqIndex}

/** Behavior spec for IVF-PQ — the contracts the oracle hash can't
  * express alone: residual quantization beats flat PQ at equal code
  * budget (the reason the composition exists), search candidates come
  * ONLY from probed cells, pruning rides a broadcast equi-join (not a
  * cross), and encode stays map-side.
  */
class IvfPqSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private lazy val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    .select("vec_id", "embedding")

  private val (m, k, iters) = (4, 4, 2)
  private lazy val cents = KMeans.fit(emb, k = 4, iters = 2)
  private lazy val books = IvfPq.fit(emb, cents, m, k, iters)

  test("residual PQ reconstructs tighter than flat PQ at the same code budget") {
    // identical m/k/iters — the only difference is quantizing residuals
    // instead of raw vectors; total squared error must shrink (this is
    // Jégou §V's point, and it is what justifies the composed index)
    val flatBooks = PqIndex.fit(emb, m, k, iters)
    val flatErr = PqIndex.encode(emb, flatBooks)
      .agg(sum("err2")).first().getLong(0)
    val resErr = IvfPq.encode(emb, cents, books)
      .agg(sum("err2")).first().getLong(0)
    assert(resErr < flatErr,
      s"residual err2 $resErr should beat flat err2 $flatErr")
  }

  test("every search candidate comes from a probed cell") {
    val nprobe = 2
    val queries = KMeans.quantized(emb).filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("qv"))
    val codes = IvfPq.encode(emb, cents, books)
    val got = IvfPq.search(codes, queries, cents, books, nprobe, k = 10)
      .collect()
    // recompute the probe sets driver-side from the same arithmetic
    val qvs = queries.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    got.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      val probed = cents.zipWithIndex.map { case (c, cell) =>
        (qvs(qid).zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, cell)
      }.sorted.take(nprobe).map(_._2).toSet
      val seen = rows.map(_.getAs[Int]("cell")).toSet
      assert(seen.subsetOf(probed),
        s"query $qid returned cells $seen outside probe set $probed")
    }
  }

  test("encode is map-side and search prunes via a broadcast equi-join") {
    val encPlan = IvfPq.encode(emb, cents, books)
      .queryExecution.executedPlan.toString
    assert(!encPlan.contains("Exchange"), s"encode must not shuffle:\n$encPlan")
    val queries = KMeans.quantized(emb).filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("qv"))
    val sPlan = IvfPq.search(IvfPq.encode(emb, cents, books), queries,
        cents, books, nprobe = 2, k = 10)
      .queryExecution.executedPlan.toString
    assert(sPlan.contains("BroadcastHashJoin"),
      s"probe pruning must be a broadcast equi-join:\n${sPlan.take(1500)}")
    assert(!sPlan.contains("BroadcastNestedLoopJoin") &&
      !sPlan.contains("CartesianProduct"),
      s"search must not cross-join:\n${sPlan.take(1500)}")
  }
}
