package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KMeans

/** Behavior spec for the distributed fixed-point k-means — planted
  * clusters from first principles plus the contracts the oracle hash
  * can't express alone (partition invariance, empty-cluster retention,
  * tie-break direction, coreset quota).
  */
class KMeansSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  /** Two tight planted clusters far apart, dims = 4: ids 0-3 near
    * (1, 1, 0, 0), ids 4-7 near (-1, -1, 0, 0). Any Lloyd trajectory
    * from any seeding must separate them after 3 rounds.
    */
  private def planted = Seq(
    (0L, Array(1.00f, 1.00f, 0.01f, 0.0f)),
    (1L, Array(0.99f, 1.01f, 0.00f, 0.0f)),
    (2L, Array(1.01f, 0.99f, -0.01f, 0.0f)),
    (3L, Array(1.00f, 1.02f, 0.02f, 0.0f)),
    (4L, Array(-1.00f, -1.00f, 0.01f, 0.0f)),
    (5L, Array(-0.99f, -1.01f, 0.00f, 0.0f)),
    (6L, Array(-1.01f, -0.99f, -0.01f, 0.0f)),
    (7L, Array(-1.00f, -1.02f, 0.02f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("planted clusters are recovered exactly") {
    val asg = KMeans.fitAssign(planted, k = 2, iters = 3, dims = 4)
      .orderBy("vec_id").collect()
    val groups = asg.map(r => (r.getLong(0), r.getInt(1))).toMap
    val a = (0L to 3L).map(groups).toSet
    val b = (4L to 7L).map(groups).toSet
    assert(a.size === 1 && b.size === 1 && a != b,
      s"planted clusters not separated: $groups")
    // converged centroids: every member is close (dist2 in e6² units;
    // members are within ~0.03 of their mean per dim → dist2 < 4·(3e4)²)
    assert(asg.forall(_.getLong(2) < 4L * 30000L * 30000L))
  }

  test("assignment is partition-invariant and a pure function of the fit") {
    val cents = KMeans.fit(planted, k = 2, iters = 3, dims = 4)
    val one = KMeans.assign(KMeans.quantized(planted), cents)
      .orderBy("vec_id").collect().map(_.toString).toSeq
    val many = KMeans.assign(KMeans.quantized(planted.repartition(7)), cents)
      .orderBy("vec_id").collect().map(_.toString).toSeq
    assert(one === many)
    val cents2 = KMeans.fit(planted.repartition(5), k = 2, iters = 3, dims = 4)
    assert(cents.map(_.toSeq) === cents2.map(_.toSeq),
      "fit drifted under repartitioning — integer sums must be order-independent")
  }

  test("an emptied cluster keeps its centroid and reports n = 0") {
    // two coincident points far from six others, k = 3: at most two
    // distinct final centroids can hold members, so some cluster
    // empties (or holds a seed duplicate) — the summary must still
    // report k rows with the retained centroid norm.
    val dup = Seq(
      (0L, Array(5f, 5f, 5f, 5f)), (1L, Array(5f, 5f, 5f, 5f)),
      (2L, Array(-5f, -5f, -5f, -5f)), (3L, Array(-5f, -5f, -5f, -5f)),
      (4L, Array(-5f, -5f, -5f, -5f)), (5L, Array(-5f, -5f, -5f, -5f)),
      (6L, Array(-5f, -5f, -5f, -5f)), (7L, Array(-5f, -5f, -5f, -5f))
    ).toDF("vec_id", "embedding")
    val sum3 = KMeans.summary(dup, k = 3, iters = 2, dims = 4)
      .collect()
    assert(sum3.length === 3)
    assert(sum3.map(_.getAs[Long]("n")).sum === 8L)
    // every centroid row carries a norm even if unoccupied
    assert(sum3.forall(r => r.getAs[Long]("cent_norm2") > 0L))
  }

  test("equidistant points break ties to the smaller cluster id") {
    val cents = Seq(Array(1000000L, 0L), Array(-1000000L, 0L))
    val mid = Seq((0L, Array(0f, 3f))).toDF("vec_id", "embedding")
    val r = KMeans.assign(KMeans.quantized(mid), cents).first()
    assert(r.getInt(1) === 0, "tie must go to cluster 0")
  }

  test("coreset keeps at most quota per cluster and only real members") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val quota = 3
    val asg = KMeans.fitAssign(emb, k = 4, iters = 2)
      .select("vec_id", "cluster")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val cs = KMeans.coreset(emb, k = 4, iters = 2, quota = quota).collect()
    val perCluster = cs.groupBy(_.getInt(1)).view.mapValues(_.length)
    assert(perCluster.values.forall(_ <= quota))
    cs.foreach { r =>
      assert(asg(r.getLong(0)) === r.getInt(1),
        "coreset row must carry the member's true cluster")
    }
    // quota selection is the md5 order: re-running yields identical rows
    val again = KMeans.coreset(emb, k = 4, iters = 2, quota = quota).collect()
    assert(cs.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("bounded-sample fit: trains on the md5-prefix sample; a bound >= n is exactly the full fit (VERDICT r19 #6)") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = KMeans.quantized(emb).localCheckpoint()
    val n = q.count()
    val t = 12L
    assert(t < n, s"fixture too small for a real sample: n=$n")
    // the sampled fit IS the full fit over the independently-computed
    // deterministic prefix — pins the sample semantics the oracle's
    // fitsmp/evfit CTEs mirror (same ordering expression)
    val prefix = q
      .withColumn("h", md5(col("vec_id").cast("string")))
      .orderBy(col("h"), col("vec_id"))
      .limit(t.toInt)
      .select("vec_id", "qv")
      .localCheckpoint()
    val sampled = KMeans.fitQ(q, k = 4, iters = 2, dims = 64,
      maxTrainRows = t)
    val overPrefix = KMeans.fitQ(prefix, k = 4, iters = 2, dims = 64)
    assert(sampled.map(_.toSeq) === overPrefix.map(_.toSeq),
      "sampled fit diverged from the fit over its own prefix")
    // hash-compat property: a bound at least the corpus size changes
    // NOTHING — the driver-SF degenerate region b13/b14/b15 rely on
    val full = KMeans.fitQ(q, k = 4, iters = 2, dims = 64)
    val bounded = KMeans.fitQ(q, k = 4, iters = 2, dims = 64,
      maxTrainRows = n + 5)
    assert(full.map(_.toSeq) === bounded.map(_.toSeq),
      "an over-sized bound must degenerate to the unsampled fit")
    // the sampled fit genuinely differs from the full one here (the
    // test would be vacuous if the sample reproduced the full fit)
    assert(sampled.map(_.toSeq) !== full.map(_.toSeq),
      "fixture degenerate: sample and full fit coincide")
    // and assignment of ALL rows under sampled centroids still covers
    // every vector (fit is bounded; assignment never is)
    assert(KMeans.assign(q, sampled).count() === n)
  }
}
