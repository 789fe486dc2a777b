package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IvfPq, KMeans}

/** Bit-identity of the three physical assignment paths — the unrolled-
  * literal argmin (k·dims AST nodes, zero shuffle), the packed
  * single-literal argmin (flat plan, zero shuffle — the large-k
  * default), and the broadcast-join argmin (for centroid relations too
  * large to collect) — on the real embeddings table, on planted
  * equidistant ties, and through a full forced-path fit. The dispatch
  * at `KMeans.MaxLiteralK` is purely physical; these cases are what
  * make that claim checkable.
  */
class KMeansJoinSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def emb = Tables.load(spark, dir, "embeddings")

  test("packed and join paths are bit-identical to the literal path on real data") {
    val cents = KMeans.fit(emb, k = 8, iters = 2)
    val q = KMeans.quantized(emb)
    val lit = KMeans.assign(q, cents, packed = Some(false))
      .orderBy("vec_id").collect().map(_.toString).toSeq
    val pk = KMeans.assign(q, cents, packed = Some(true))
      .orderBy("vec_id").collect().map(_.toString).toSeq
    val jn = KMeans.assignJoin(q, KMeans.centroidsDf(spark, cents))
      .orderBy("vec_id").collect().map(_.toString).toSeq
    assert(lit === pk)
    assert(lit === jn)
  }

  test("equidistant ties break to the smaller cluster id on ALL paths") {
    // a point exactly between two centroids: dist2 equal, so the
    // lexicographic (dist2, cluster) min must pick cluster 0 on every
    // physical form
    val pts = Seq((0L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val cents = Seq(Array(1000000L, 0L), Array(-1000000L, 0L))
    val q = KMeans.quantized(pts)
    for (force <- Seq(false, true)) {
      val r = KMeans.assign(q, cents, packed = Some(force)).collect()
      assert(r.length === 1 && r(0).getInt(1) === 0,
        s"tie should break to cluster 0 (packed=$force): ${r.toSeq}")
    }
    val j = KMeans.assignJoin(q, KMeans.centroidsDf(spark, cents)).collect()
    assert(j.length === 1 && j(0).getInt(1) === 0,
      s"tie should break to cluster 0 (join): ${j.toSeq}")
  }

  test("a forced packed-path fit reproduces the literal-path trajectory exactly") {
    val a = KMeans.fit(emb, k = 8, iters = 3, dims = 64,
      packed = Some(false))
    val b = KMeans.fit(emb, k = 8, iters = 3, dims = 64,
      packed = Some(true))
    assert(a.map(_.toSeq) === b.map(_.toSeq),
      "fit trajectories diverged between physical assignment paths")
  }

  test("large-nlist residuals (packed lookup) match the literal form") {
    val cents = KMeans.fit(emb, k = 8, iters = 2)
    val q = KMeans.quantized(emb).localCheckpoint()
    // the literal form at k=8 (below MaxLiteralK)
    val lit = IvfPq.residuals(q, cents)
      .orderBy("vec_id").collect().map(_.toString).toSeq
    // pad the centroid list past MaxLiteralK with far-away fakes that
    // can never win an argmin (|x| ≤ 8 contract → real dist2 per dim
    // ≤ (1.6e7)²·64; the fakes sit at 100·e6 per dim) — the padded
    // call takes the packed path while assigning every vector to the
    // same cell with the same residual
    val far = (cents.length until KMeans.MaxLiteralK + 1)
      .map(i => Array.fill(64)(100000000L + i))
    val jn = IvfPq.residuals(q, cents ++ far)
      .orderBy("vec_id").collect().map(_.toString).toSeq
    assert(lit === jn)
  }

  test("the packed path plans no exchange and no join") {
    val cents = KMeans.fit(emb, k = 8, iters = 1)
    val plan = KMeans.assign(KMeans.quantized(emb), cents,
        packed = Some(true))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"packed assignment must stay map-side:\n$plan")
  }
}
