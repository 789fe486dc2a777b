package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IvfIndex

/** Incremental growth of a persisted IVF index: appending the second
  * half of a corpus to an index saved with the first half must be
  * indistinguishable — store content and search results — from saving
  * the full corpus at once (same frozen quantizer either way).
  */
class IvfAppendSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // the planted-cluster fixture of SimilaritySpec: 10 clear clusters so
  // nearest-center assignment is unambiguous for every vector
  private lazy val planted = {
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(10, 16)((rnd.nextDouble() * 2 - 1).toFloat)
    val vecs = for (c <- 0 until 10; i <- 0 until 30) yield {
      val v = centers(c).map(x => x + (rnd.nextDouble() * 0.1 - 0.05).toFloat)
      ((c * 30 + i).toLong, v)
    }
    vecs.toDF("vec_id", "embedding").cache()
  }
  private val queries = (0 until 10).map(c => (c * 30).toLong)

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int, Double)] =
    df.select("query_id", "neighbor_id", "rnk", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet

  private def storeRows(dir: String): (Set[(Long, Int)], Set[(Long, Int, Int)]) = (
    spark.read.parquet(s"$dir/assigned")
      .select(col("vec_id").cast("long"), col("cell")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet,
    spark.read.parquet(s"$dir/by_id")
      .select(col("vec_id"), col("cell"), col("_idb")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet)

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("append of the second half equals a full save — stores and searches") {
    val full = IvfIndex.build(planted, nlist = 10)
    val fullDir = tmp("graft_ivf_full")
    IvfIndex.save(full, fullDir)

    // same quantizer, but the saved index holds only vec_id < 150
    val halfDir = tmp("graft_ivf_half")
    IvfIndex.save(IvfIndex.BuiltIvf(
      full.assigned.filter(col("vec_id") < 150L), full.centers), halfDir)
    val delta = planted.filter(col("vec_id") >= 150L)

    val appended = IvfIndex.appendToSaved(spark, halfDir, delta)
    assert(appended === 150L)
    assert(storeRows(halfDir) === storeRows(fullDir),
      "appended store differs from a full save")

    val a = IvfIndex.load(spark, halfDir)
    val b = IvfIndex.load(spark, fullDir)
    assert(rows(IvfIndex.searchPrebuilt(a, queries, 5, nprobe = 2)) ===
      rows(IvfIndex.searchPrebuilt(b, queries, 5, nprobe = 2)))
    assert(rows(IvfIndex.searchPruned(a, queries.take(4), 5, nprobe = 2)) ===
      rows(IvfIndex.searchPruned(b, queries.take(4), 5, nprobe = 2)))

    // idempotence: the same delta again is a no-op (pointer anti-join)
    assert(IvfIndex.appendToSaved(spark, halfDir, delta) === 0L)
    assert(storeRows(halfDir) === storeRows(fullDir))
  }

  test("centroid drift: an in-distribution append does not flag, a shifted one does") {
    // r10 verdict #5: appendToSaved assigns against frozen centroids
    // forever; the drift metric must expose when the incoming
    // distribution has left them behind. Baseline = build corpus's mean
    // assigned distance (written by save); each append logs its delta's
    // ratio against it.
    val full = IvfIndex.build(planted, nlist = 10)
    val dir = tmp("graft_ivf_drift")
    IvfIndex.save(IvfIndex.BuiltIvf(
      full.assigned.filter(col("vec_id") < 150L), full.centers), dir)
    assert(IvfIndex.driftStatus(spark, dir).isEmpty,
      "no append yet — no drift record")

    // unshifted: the other half of the SAME planted clusters
    IvfIndex.appendToSaved(spark, dir, planted.filter(col("vec_id") >= 150L))
    val inDist = IvfIndex.driftStatus(spark, dir).get
    assert(!inDist.flagged,
      s"in-distribution append flagged drift (ratio ${inDist.ratio})")
    assert(inDist.ratio < IvfIndex.DriftRetrainRatio)
    assert(inDist.seq === 1L && inDist.n === 150L)

    // shifted: vectors far outside every planted cluster (scaled up 5×
    // plus an offset) — mean assigned distance must blow past the bar
    val shifted = planted.filter(col("vec_id") >= 150L)
      .select((col("vec_id") + 1000L).as("vec_id"),
        transform(col("embedding"), x => x * 5.0f + 3.0f).as("embedding"))
    IvfIndex.appendToSaved(spark, dir, shifted)
    val outDist = IvfIndex.driftStatus(spark, dir).get
    assert(outDist.flagged,
      s"shifted append did not flag drift (ratio ${outDist.ratio})")
    assert(outDist.seq === 2L,
      "drift log must order appends")
  }

  test("retrain acts on flagged drift: centroids refit, drift cleared, serving matches a fresh build") {
    val full = IvfIndex.build(planted, nlist = 10)
    val dir = tmp("graft_ivf_retrain")
    IvfIndex.save(IvfIndex.BuiltIvf(
      full.assigned.filter(col("vec_id") < 150L), full.centers), dir)

    // a shifted append: five far-away clusters the frozen quantizer
    // cannot place well — the drift metric flags it
    val shifted = planted.filter(col("vec_id") >= 150L)
      .select((col("vec_id") + 1000L).as("vec_id"),
        transform(col("embedding"), x => x * 5.0f + 3.0f).as("embedding"))
      .localCheckpoint()
    IvfIndex.appendToSaved(spark, dir, shifted)
    assert(IvfIndex.driftStatus(spark, dir).get.flagged,
      "fixture must flag before the action face runs")

    val retrained = IvfIndex.retrain(spark, dir)
    // the report face is reset: ratios against the retired baseline are
    // gone, the next append measures against the new fit
    assert(IvfIndex.driftStatus(spark, dir).isEmpty, "drift did not clear")

    // served results bit-match a FRESH build+save of the same logical
    // corpus (the append-vs-full discipline): the re-fit centroids place
    // the shifted clusters in their own cells, and the exact re-rank
    // makes results independent of centroid jitter on clustered data
    val logical = planted.filter(col("vec_id") < 150L).unionByName(shifted)
    val freshDir = tmp("graft_ivf_fresh")
    IvfIndex.save(IvfIndex.build(logical, nlist = 10), freshDir)
    val q2 = (0 until 5).map(c => (c * 30).toLong) ++
      (5 until 10).map(c => (c * 30).toLong + 1000L)
    assert(rows(IvfIndex.searchPrebuilt(retrained, q2, 5, nprobe = 2)) ===
      rows(IvfIndex.searchPrebuilt(IvfIndex.load(spark, freshDir), q2, 5,
        nprobe = 2)))
    assert(rows(IvfIndex.searchPruned(IvfIndex.load(spark, dir), q2, 5,
        nprobe = 2)) ===
      rows(IvfIndex.searchPruned(IvfIndex.load(spark, freshDir), q2, 5,
        nprobe = 2)))

    // the next append measures against the NEW baseline: the same
    // distribution that flagged before retrain is in-distribution now
    val more = shifted.select((col("vec_id") + 1000L).as("vec_id"),
      col("embedding"))
    IvfIndex.appendToSaved(spark, dir, more)
    val post = IvfIndex.driftStatus(spark, dir).get
    assert(!post.flagged,
      s"post-retrain in-distribution append flagged (ratio ${post.ratio})")
  }

  test("retrain keeps a quantized store quantized and serving-consistent") {
    val full = IvfIndex.build(planted, nlist = 10)
    val dir = tmp("graft_ivf_retrain_q")
    IvfIndex.saveQuantized(full, dir)
    IvfIndex.retrain(spark, dir)
    val raw = spark.read.parquet(s"$dir/assigned")
    assert(raw.columns.contains("qvec"), "retrain forked the store to floats")
    // the retrained quantized index still serves: every query's top hit
    // is a member of its own planted cluster
    val served = IvfIndex.searchPruned(IvfIndex.load(spark, dir),
      queries, 5, nprobe = 2)
    served.filter(col("rnk") === 1).collect().foreach { r =>
      assert(r.getLong(1) / 30L === r.getLong(0) / 30L,
        s"query ${r.getLong(0)} top hit left its cluster")
    }
  }

  test("crash mid-append: repairPointers heals orphan vectors, then the re-run is a no-op") {
    val full = IvfIndex.build(planted, nlist = 10)
    val fullDir = tmp("graft_ivf_ref")
    IvfIndex.save(full, fullDir)

    val dir = tmp("graft_ivf_crash")
    IvfIndex.save(IvfIndex.BuiltIvf(
      full.assigned.filter(col("vec_id") < 150L), full.centers), dir)
    IvfIndex.appendToSaved(spark, dir, planted.filter(col("vec_id") >= 150L))

    // simulate the documented crash window (vectors landed, pointer
    // write did not): remove the delta's pointers again
    val survivors = spark.read.parquet(s"$dir/by_id")
      .filter(col("vec_id") < 150L).localCheckpoint(true)
    survivors.write.mode("overwrite").partitionBy("_idb").parquet(s"$dir/by_id")
    // the orphans are invisible to the anti-join: a naive re-run would
    // duplicate them — which is exactly why the contract says repair first
    IvfIndex.repairPointers(spark, dir)
    assert(storeRows(dir) === storeRows(fullDir), "repair did not rebuild pointers")
    assert(IvfIndex.appendToSaved(spark, dir,
      planted.filter(col("vec_id") >= 150L)) === 0L)
    assert(storeRows(dir) === storeRows(fullDir))
    assert(rows(IvfIndex.searchPruned(IvfIndex.load(spark, dir),
        queries.take(4), 5, nprobe = 2)) ===
      rows(IvfIndex.searchPruned(IvfIndex.load(spark, fullDir),
        queries.take(4), 5, nprobe = 2)))
  }
}
