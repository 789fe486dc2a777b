package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IvfPq, KMeans}

/** The persisted IVF-PQ serving artifact (n27's operator surface):
  * save → load round-trips the fitted model bit-for-bit, the loaded
  * store answers searchRerank identically to the ad-hoc chain, the
  * serve path runs ZERO fit jobs, and a corrupted artifact fails loud
  * instead of remapping silently.
  */
class IvfPqArtifactSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private val nlist = 8
  private val (m, k, iters, dims) = (4, 4, 2, 64)

  private lazy val emb = Tables
    .load(spark, "/root/testdata/sf0.001", "embeddings")
    .localCheckpoint()
  private lazy val cents = KMeans.fit(emb, nlist, 3, dims)
  private lazy val books = IvfPq.fit(emb, cents, m, k, iters, dims)
  private lazy val dir = {
    val d = Files.createTempDirectory("graft_ivfpq_art").toString
    IvfPq.save(emb, d, cents, books, dims)
    d
  }

  test("save → loadModel round-trips centroids and codebooks exactly") {
    val (lc, lb) = IvfPq.loadModel(spark, dir)
    assert(lc.map(_.toSeq) === cents.map(_.toSeq))
    assert(lb.map(_.map(_.toSeq)) === books.map(_.map(_.toSeq)))
  }

  test("the loaded store serves searchRerank identically to the ad-hoc chain, with zero fit jobs") {
    dir // force the save OUTSIDE the counted window
    val queries = KMeans.quantized(emb).filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("qv"))
      .localCheckpoint()
    val adHoc = IvfPq.searchRerank(IvfPq.encode(emb, cents, books, dims),
        KMeans.quantized(emb), queries, cents, books,
        nprobe = 2, kCand = 10, k = 5, dims)
      .collect().map(_.toString).toSeq

    // ZERO FIT JOBS on the whole served search: every job launched in
    // the window is recorded with its call site — none may originate
    // in the fit code (KMeans.scala seeding/assignment rounds,
    // PqIndex.scala book rounds). Call-site attribution, not a count:
    // AQE splits shuffles into extra jobs, but it cannot move a job's
    // origin out of the fitting files.
    val sites = java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]())
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        sites.add(Option(js.properties)
          .map(_.getProperty("callSite.short", "")).getOrElse(""))
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val served =
      try {
        val (lc, lb) = IvfPq.loadModel(spark, dir)
        val res = IvfPq.searchRerank(
            spark.read.parquet(s"$dir/codes"),
            spark.read.parquet(s"$dir/vectors"),
            queries, lc, lb, nprobe = 2, kCand = 10, k = 5, dims)
          .collect().map(_.toString).toSeq
        Thread.sleep(300)
        res
      } finally spark.sparkContext.removeSparkListener(listener)
    import scala.jdk.CollectionConverters._
    val fitJobs = sites.asScala.filter(s =>
      s.contains("KMeans.scala") || s.contains("PqIndex.scala"))
    assert(fitJobs.isEmpty,
      s"the serve path launched fit jobs at: ${fitJobs.mkString(", ")}")
    assert(sites.asScala.nonEmpty, "listener saw no jobs — window broken")
    assert(served === adHoc,
      "the loaded artifact diverged from the ad-hoc chain")
  }

  test("the codes store is cell-partitioned: a probed-cell filter prunes files") {
    val codes = spark.read.parquet(s"$dir/codes")
    val allFiles = codes.select(input_file_name()).distinct().count()
    val oneCell = codes.filter(col("cell") === 0)
      .select(input_file_name()).distinct().count()
    assert(allFiles >= 4 && oneCell < allFiles,
      s"cell filter must prune files: $oneCell of $allFiles")
  }

  test("appendToSaved: frozen-model append is idempotent, serves identically to an ad-hoc union, logs drift, runs no fit") {
    import spark.implicits._
    val d2 = Files.createTempDirectory("graft_ivfpq_app").toString
    IvfPq.save(emb, d2, cents, books, dims)
    // in-distribution delta: corpus vectors under fresh ids
    val delta = emb.limit(20)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      .localCheckpoint()
    val sites = java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]())
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        sites.add(Option(js.properties)
          .map(_.getProperty("callSite.short", "")).getOrElse(""))
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val n1 =
      try { val n = IvfPq.appendToSaved(spark, d2, delta, dims)
        Thread.sleep(300); n }
      finally spark.sparkContext.removeSparkListener(listener)
    import scala.jdk.CollectionConverters._
    val fitJobs = sites.asScala.filter(s =>
      s.contains("KMeans.scala") || s.contains("PqIndex.scala"))
    assert(fitJobs.isEmpty, s"append launched fit jobs at: $fitJobs")
    assert(n1 === 20L)
    // idempotence: re-delivering the same delta appends nothing
    assert(IvfPq.appendToSaved(spark, d2, delta, dims) === 0L)

    // the appended store answers searchRerank exactly as an ad-hoc
    // chain over the UNION corpus under the same frozen model
    val queries = KMeans.quantized(emb).filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("qv"))
    val union = emb.select("vec_id", "embedding").union(delta)
    val adHoc = IvfPq.searchRerank(IvfPq.encode(union, cents, books, dims),
        KMeans.quantized(union), queries, cents, books,
        nprobe = 2, kCand = 10, k = 5, dims)
      .collect().map(_.toString).toSeq
    val served = IvfPq.searchRerank(
        spark.read.parquet(s"$d2/codes"),
        spark.read.parquet(s"$d2/vectors"),
        queries, cents, books, nprobe = 2, kCand = 10, k = 5, dims)
      .collect().map(_.toString).toSeq
    assert(served === adHoc,
      "appended store diverged from the ad-hoc union chain")

    // drift: the in-distribution append reads ≈ baseline (not flagged);
    // a shifted delta (vectors scaled 3×, off the frozen codebooks)
    // must flag
    val log1 = spark.read.parquet(s"$d2/drift_log").orderBy("seq").collect()
    assert(log1.length === 1 && !log1(0).getAs[Boolean]("flagged"),
      s"in-distribution append flagged: ${log1.mkString(";")}")
    val shifted = emb.limit(20)
      .select((col("vec_id") + 2000000L).as("vec_id"),
        org.apache.spark.sql.functions.transform(col("embedding"),
          x => x * lit(3.0f)).as("embedding"))
    assert(IvfPq.appendToSaved(spark, d2, shifted, dims) === 20L)
    val log2 = spark.read.parquet(s"$d2/drift_log").orderBy("seq").collect()
    assert(log2.length === 2 && log2(1).getAs[Boolean]("flagged"),
      s"shifted append not flagged: ratio=${log2(1).getAs[Double]("ratio")}")
  }

  test("retrain from the artifact's own store equals a from-corpus fit; the swap is atomic and self-heals") {
    val d3 = Files.createTempDirectory("graft_ivfpq_rt").toString + "/idx"
    IvfPq.save(emb, d3, cents, books, dims)
    val delta = emb.limit(15)
      .select((col("vec_id") + 3000000L).as("vec_id"), col("embedding"))
      .localCheckpoint()
    assert(IvfPq.appendToSaved(spark, d3, delta, dims) === 15L)

    IvfPq.retrain(spark, d3, nlist, m, k, coarseIters = 3, pqIters = iters,
      dims)
    val (rc, rb) = IvfPq.loadModel(spark, d3)
    // bit-identity: the store holds exact quantized vectors, so the
    // retrain must reproduce a from-scratch fit over the union corpus
    val union = emb.select("vec_id", "embedding").union(delta)
      .localCheckpoint()
    val fc = KMeans.fit(union, nlist, 3, dims)
    val fb = IvfPq.fit(union, fc, m, k, iters, dims)
    assert(rc.map(_.toSeq) === fc.map(_.toSeq),
      "retrained centroids diverged from the from-corpus fit")
    assert(rb.map(_.map(_.toSeq)) === fb.map(_.map(_.toSeq)),
      "retrained codebooks diverged from the from-corpus fit")
    // and the republished store serves the new model exactly
    val queries = KMeans.quantized(emb).filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("qv"))
    val adHoc = IvfPq.searchRerank(IvfPq.encode(union, fc, fb, dims),
        KMeans.quantized(union), queries, fc, fb,
        nprobe = 2, kCand = 10, k = 5, dims)
      .collect().map(_.toString).toSeq
    val served = IvfPq.searchRerank(
        spark.read.parquet(s"$d3/codes"),
        spark.read.parquet(s"$d3/vectors"),
        queries, rc, rb, nprobe = 2, kCand = 10, k = 5, dims)
      .collect().map(_.toString).toSeq
    assert(served === adHoc, "retrained store diverged from ad-hoc")
    // staging/retired cleaned up
    assert(!new java.io.File(d3 + ".staging").exists())
    assert(!new java.io.File(d3 + ".retired").exists())

    // crash window: live stranded at .retired (death between the two
    // renames) — the next loadModel self-heals and serves the artifact
    val fs = new org.apache.hadoop.fs.Path(d3)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(d3),
      new org.apache.hadoop.fs.Path(d3 + ".retired")))
    val (hc, hb) = IvfPq.loadModel(spark, d3)
    assert(hc.map(_.toSeq) === rc.map(_.toSeq) &&
      hb.map(_.map(_.toSeq)) === rb.map(_.map(_.toSeq)),
      "self-healed load diverged from the published model")
    assert(new java.io.File(s"$d3/vectors").exists())
  }

  test("a query STREAM serves from the persisted artifact: PqStream.serve composes with loadModel") {
    // the continuous-serving face of the n27 artifact: queries arrive
    // as a stream, the store + model are the loaded artifact — chopped
    // answers must equal the batch search from the same loaded pieces
    import spark.implicits._
    import org.apache.spark.sql.types._
    val (lc, lb) = IvfPq.loadModel(spark, dir)
    val qRows = emb.limit(4).collect()
      .map(r => (r.getLong(0) + 5000000L, r.getSeq[Float](1).toArray)).toSeq
    val qSchema = StructType(Seq(StructField("query_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val srcDir = Files.createTempDirectory("graft_art_qsrc").toString
    val base = Files.createTempDirectory("graft_art_serve").toString
    Seq(qRows.take(2), qRows.drop(2)).zipWithIndex.foreach { case (rs, i) =>
      rs.toDF("query_id", "embedding").coalesce(1)
        .write.mode("overwrite").parquet(s"$srcDir/f$i")
      new java.io.File(s"$srcDir/f$i").listFiles()
        .foreach(f => f.setLastModified(1700000000000L + i * 60000L))
    }
    val src = spark.readStream.schema(qSchema)
      .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
      .parquet(s"$srcDir/*")
    val q = graft.streaming.PqStream.serve(src, s"$dir/codes", lc, lb,
        s"$base/res", s"$base/ck", k = 5, nprobe = 2, dims)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.read.parquet(s"$base/res")
      .select("query_id", "neighbor_id", "adist2", "rnk")
      .collect().map(_.toString).toSet
    val batchQ = KMeans.quantized(qRows.toDF("query_id", "embedding")
        .select(col("query_id").as("vec_id"), col("embedding")))
      .select(col("vec_id").as("query_id"), col("qv"))
    val expected = IvfPq.search(spark.read.parquet(s"$dir/codes"), batchQ,
        lc, lb, nprobe = 2, k = 5, dims, excludeSelf = false)
      .select("query_id", "neighbor_id", "adist2", "rnk")
      .collect().map(_.toString).toSet
    assert(expected.nonEmpty)
    assert(streamed === expected,
      "streamed serving from the artifact diverged from batch search")
  }

  test("the two-stage stream serves from the artifact: PqStream.serveRerank chops ≡ batch searchRerankDf") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val qRows = emb.limit(4).collect()
      .map(r => (r.getLong(0) + 6000000L, r.getSeq[Float](1).toArray)).toSeq
    val qSchema = StructType(Seq(StructField("query_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val srcDir = Files.createTempDirectory("graft_rr_qsrc").toString
    val base = Files.createTempDirectory("graft_rr_serve").toString
    Seq(qRows.take(2), qRows.drop(2)).zipWithIndex.foreach { case (rs, i) =>
      rs.toDF("query_id", "embedding").coalesce(1)
        .write.mode("overwrite").parquet(s"$srcDir/f$i")
      new java.io.File(s"$srcDir/f$i").listFiles()
        .foreach(f => f.setLastModified(1700000000000L + i * 60000L))
    }
    val src = spark.readStream.schema(qSchema)
      .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
      .parquet(s"$srcDir/*")
    val q = graft.streaming.PqStream.serveRerank(src, dir,
        s"$base/res", s"$base/ck", kCand = 10, k = 5, nprobe = 2, dims)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.read.parquet(s"$base/res")
      .select("query_id", "neighbor_id", "adist2", "dist2", "rnk")
      .collect().map(_.toString).toSet
    val (lc, lb) = IvfPq.loadModel(spark, dir)
    val batchQ = KMeans.quantized(qRows.toDF("query_id", "embedding")
        .select(col("query_id").as("vec_id"), col("embedding")))
      .select(col("vec_id").as("query_id"), col("qv"))
    val expected = IvfPq.searchRerankDf(
        spark.read.parquet(s"$dir/codes"),
        spark.read.parquet(s"$dir/vectors"),
        batchQ, lc, lb, nprobe = 2, kCand = 10, k = 5, dims,
        excludeSelf = false)
      .select("query_id", "neighbor_id", "adist2", "dist2", "rnk")
      .collect().map(_.toString).toSet
    assert(expected.nonEmpty)
    assert(streamed === expected,
      "streamed two-stage serving diverged from batch searchRerankDf")
  }

  test("mid-append crash window: repairCodes heals orphan vectors; retrain self-heals a stranded live dir") {
    val d4 = Files.createTempDirectory("graft_ivfpq_crw").toString + "/idx"
    IvfPq.save(emb, d4, cents, books, dims)
    val delta = emb.limit(10)
      .select((col("vec_id") + 4000000L).as("vec_id"), col("embedding"))
      .localCheckpoint()
    assert(IvfPq.appendToSaved(spark, d4, delta, dims) === 10L)
    // simulate the crash: the delta's CODES (the last write) never
    // landed, its vectors did — exactly the window the vectors-first
    // order leaves (ADVICE r16: the anti-join target is written last)
    val codesKept = spark.read.parquet(s"$d4/codes")
      .filter(col("vec_id") < 4000000L).localCheckpoint()
    codesKept.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$d4/codes")
    // heal, then prove the healed store ≡ the ad-hoc union chain
    assert(IvfPq.repairCodes(spark, d4, dims) === 10L)
    assert(IvfPq.repairCodes(spark, d4, dims) === 0L, "heal not idempotent")
    // a replayed append after the heal is a no-op — no duplicate
    // vectors ever enter the store
    assert(IvfPq.appendToSaved(spark, d4, delta, dims) === 0L)
    assert(spark.read.parquet(s"$d4/vectors").groupBy("vec_id").count()
      .filter(col("count") > 1L).count() === 0L,
      "crash replay duplicated vector rows")
    val queries = KMeans.quantized(emb).filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("qv"))
    val union = emb.select("vec_id", "embedding").union(delta)
    val adHoc = IvfPq.searchRerank(IvfPq.encode(union, cents, books, dims),
        KMeans.quantized(union), queries, cents, books,
        nprobe = 2, kCand = 10, k = 5, dims)
      .collect().map(_.toString).toSeq
    val healed = IvfPq.searchRerank(
        spark.read.parquet(s"$d4/codes"),
        spark.read.parquet(s"$d4/vectors"),
        queries, cents, books, nprobe = 2, kCand = 10, k = 5, dims)
      .collect().map(_.toString).toSeq
    assert(healed === adHoc, "healed store diverged from ad-hoc union")

    // retrain after a crashed SWAP (live stranded at .retired) must
    // self-heal instead of failing on the vectors read (ADVICE r16)
    val fs = new org.apache.hadoop.fs.Path(d4)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(d4),
      new org.apache.hadoop.fs.Path(d4 + ".retired")))
    IvfPq.retrain(spark, d4, nlist, m, k, coarseIters = 3,
      pqIters = iters, dims)
    assert(new java.io.File(s"$d4/vectors").exists())
    assert(!new java.io.File(d4 + ".retired").exists())
  }

  test("recall gate: an append that starves the probed cells flags; retrain with a larger nlist clears it (VERDICT r17 #3)") {
    import spark.implicits._
    val d6 = Files.createTempDirectory("graft_ivfpq_rc").toString + "/idx"
    val dims4 = 4
    def v(x: Long, y: Long) = Seq(x.toFloat, y.toFloat, 0f, 0f)
    // controlled geometry: three tight clusters; the query sits between
    // cluster0 and cluster2's column, so its nprobe=2 probe set is
    // {cell0, cell1} — any vector nearer the query than cell0's members
    // but assigned to cell2 is exactly the recall-starving append
    val base = (
      (0L until 5L).map(i => (i, v(i, 0L))) ++
      (10L until 14L).map(i => (i, v(1000L + (i - 10L), 0L))) ++
      (20L until 24L).map(i => (i, v(450L, 800L + (i - 20L))))
    ).toDF("vec_id", "embedding")
    val cents4 = Seq(
      Array(0L, 0L, 0L, 0L),
      Array(1000000000L, 0L, 0L, 0L),
      Array(450000000L, 800000000L, 0L, 0L))
    val books4 = graft.operators.PqIndex.fitQuantized(
      IvfPq.residuals(KMeans.quantized(base), cents4).localCheckpoint(),
      2, 4, 2, dims4)
    IvfPq.save(base, d6, cents4, books4, dims4)
    val q = Seq((99L, Seq(450000000L, 0L, 0L, 0L)))
      .toDF("query_id", "qv").localCheckpoint()

    val pre = IvfPq.recallStatus(spark, d6, q,
      k = 5, nprobe = 2, kCand = 12, dims = dims4, log = true)
    assert(pre.nQueries === 1L)
    assert(pre.recall === 1.0 && !pre.flagged,
      s"healthy artifact should serve exact top-k here: $pre")

    // vectors at (450, 430+j): exact-nearer to the query than every
    // cell0 member, but coarse-assigned to the UNPROBED cell2
    val delta = (30L until 33L).map(i => (i, v(450L, 430L + (i - 30L))))
      .toDF("vec_id", "embedding")
    assert(IvfPq.appendToSaved(spark, d6, delta, dims4) === 3L)
    val post = IvfPq.recallStatus(spark, d6, q,
      k = 5, nprobe = 2, kCand = 12, dims = dims4, log = true)
    assert(post.recall < pre.recall && post.flagged,
      s"append into an unprobed cell must degrade served recall: $post")
    // the audit series carries both measurements, seq-ordered
    val hist = IvfPq.recallHistory(spark, d6).get
      .select("seq", "flagged").collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    assert(hist === Seq((1L, false), (2L, true)),
      s"recall_log series wrong: $hist")

    // the flag's response: retrain with a larger nlist — the appended
    // region gets its own cell, which the same nprobe=2 now probes
    IvfPq.retrain(spark, d6, nlist = 4, m = 2, k = 4,
      coarseIters = 4, pqIters = 2, dims = dims4)
    val cleared = IvfPq.recallStatus(spark, d6, q,
      k = 5, nprobe = 2, kCand = 12, dims = dims4, log = true)
    assert(!cleared.flagged,
      s"retrain must clear the recall flag: $cleared")
    assert(cleared.recall > post.recall)
    // retrain's directory swap retires the series with the model it
    // measured — the post-retrain log starts fresh
    val hist2 = IvfPq.recallHistory(spark, d6).get
      .select("seq", "flagged").collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    assert(hist2 === Seq((1L, false)),
      s"post-retrain recall_log should restart: $hist2")

    // a store SMALLER than k serves a complete top-k and must score
    // 1.0, not hits/k (review r18): probe every cell so the serve is
    // exhaustive, ask for k = 10 > 3 stored-and-reachable... use a
    // 13-vector store with k far above any cell's population
    val wide = IvfPq.recallStatus(spark, d6, q,
      k = 50, nprobe = 4, kCand = 64, dims = dims4)
    assert(wide.recall === 1.0 && !wide.flagged,
      s"complete top-k over a small store must score 1.0: $wide")

    // an EMPTY query batch measures nothing: explicitly non-flagging
    // and no log write (ADVICE r18 — it used to read as recall 0.0 +
    // flagged=true, a spurious retrain signal)
    val before = IvfPq.recallHistory(spark, d6).get.count()
    val empty = IvfPq.recallStatus(spark, d6, q.filter(lit(false)),
      k = 5, nprobe = 2, kCand = 12, dims = dims4, log = true)
    assert(empty.nQueries === 0L && !empty.flagged,
      s"empty sample must not flag: $empty")
    assert(IvfPq.recallHistory(spark, d6).get.count() === before,
      "empty sample must not write a recall_log row")
  }

  test("scale-aware geometry: growth retrains into a DERIVED larger nlist that shrinks the probe fraction and restores recall (VERDICT r18 #1)") {
    import spark.implicits._
    import graft.operators.SimilarityOps
    // the derivation itself: cell population held at ~targetPop
    assert(SimilarityOps.deriveNlist(100L, 64L) === 16,
      "min clamp") // 64<<1 ≥ 100 → 2, clamped up to 16
    assert(SimilarityOps.deriveNlist(3000L, 64L) === 64)
    assert(SimilarityOps.deriveNlist(30000L, 64L, maxNlist = 1024) === 512)
    assert(SimilarityOps.deriveNlist(30000L, 64L) === 256, "max clamp")
    val d7 = Files.createTempDirectory("graft_ivfpq_geo").toString + "/idx"
    val dims4 = 4
    // 64 vectors on a 2-D grid of 16 well-separated islands of 4
    // (coordinates within the |x| ≤ 8 e6-quantization contract)
    def grid(lo: Long, n: Long) = (lo until lo + n).map { i =>
      val isl = (i - lo) / 4; val off = (i - lo) % 4
      (i, Seq(((isl % 4) * 2.0 + off * 0.01).toFloat,
        ((isl / 4) * 2.0 + off * 0.01).toFloat, 0f, 0f))
    }
    val base = grid(0L, 64L).toDF("vec_id", "embedding")
    val n0 = SimilarityOps.deriveNlist(64L, targetPop = 16L,
      minNlist = 4, maxNlist = 64)
    assert(n0 === 4, s"64 vectors at targetPop 16 should derive 4 cells, got $n0")
    val cents0 = KMeans.fitQ(KMeans.quantized(base).localCheckpoint(),
      n0, 3, dims4)
    val books0 = graft.operators.PqIndex.fitQuantized(
      IvfPq.residuals(KMeans.quantized(base), cents0).localCheckpoint(),
      2, 4, 2, dims4)
    IvfPq.save(base, d7, cents0, books0, dims4)
    // 3× growth under the frozen model
    val delta = grid(64L, 192L).toDF("vec_id", "embedding")
    assert(IvfPq.appendToSaved(spark, d7, delta, dims4) === 192L)
    // the grown store re-derives a LARGER nlist; retrainDerived applies it
    val n1 = IvfPq.retrainDerived(spark, d7, m = 2, k = 4,
      coarseIters = 3, pqIters = 2, dims = dims4,
      targetPop = 16L, minNlist = 4, maxNlist = 64)
    assert(n1 === 16 && n1 > n0,
      s"256 vectors at targetPop 16 should retrain into 16 cells, got $n1")
    val (centsR, _) = IvfPq.loadModel(spark, d7)
    assert(centsR.length === n1, "published artifact must carry the derived nlist")
    // the probe FRACTION shrinks at fixed nprobe — the 100 TB property
    // the fixed-nlist artifact lost (nprobe/nlist: 2/4 → 2/16)
    assert(2.0 / n1 < 2.0 / n0)
    // ... and the gate re-chosen on the retrained artifact meets the
    // floor at a bounded kCand: knobs travel with the model
    val knobs = IvfPq.selectKCandSaved(spark, d7, nprobe = 4, topK = 5,
      ladder = Seq(8, 16, 32), sampleMax = 6L, dims = dims4)
    assert(knobs.nlist === n1)
    assert(knobs.sampleN > 0L)
    assert(knobs.meanRecallE6 >= 800000L,
      s"retrained grid artifact should meet the recall floor: $knobs")
    assert(IvfPq.loadKnobs(spark, d7) === Some(knobs),
      "knobs must round-trip from dir/knobs")
  }

  test("2-D gate: nprobe escalates when no kCand rung can meet the floor (r19)") {
    import spark.implicits._
    val d8 = Files.createTempDirectory("graft_ivfpq_2d").toString + "/idx"
    val dims4 = 4
    def v(x: Long, y: Long) = Seq(x.toFloat, y.toFloat, 0f, 0f)
    // the recall-gate test's planted geometry, post-append state: the
    // (450, 430+j) vectors are exact-top-8 neighbors of every cell-0
    // sample query but live in cell 2 — at nprobe=1 NO candidate width
    // can reach them (recall stuck at 4/8), at nprobe=2 the probe set
    // covers them and the narrow width suffices
    val base = (
      (0L until 5L).map(i => (i, v(i, 0L))) ++
      (10L until 14L).map(i => (i, v(1000L + (i - 10L), 0L))) ++
      (20L until 24L).map(i => (i, v(450L, 800L + (i - 20L))))
    ).toDF("vec_id", "embedding")
    val cents4 = Seq(
      Array(0L, 0L, 0L, 0L),
      Array(1000000000L, 0L, 0L, 0L),
      Array(450000000L, 800000000L, 0L, 0L))
    val books4 = graft.operators.PqIndex.fitQuantized(
      IvfPq.residuals(KMeans.quantized(base), cents4).localCheckpoint(),
      2, 4, 2, dims4)
    IvfPq.save(base, d8, cents4, books4, dims4)
    val delta = (30L until 33L).map(i => (i, v(450L, 430L + (i - 30L))))
      .toDF("vec_id", "embedding")
    assert(IvfPq.appendToSaved(spark, d8, delta, dims4) === 3L)
    // nprobe=1 fails the floor at EVERY kCand rung...
    val codes = spark.read.parquet(s"$d8/codes")
    val vectors = spark.read.parquet(s"$d8/vectors")
    val k1 = IvfPq.selectKCand(codes, vectors, cents4, books4,
      nprobe = 1, topK = 8, ladder = Seq(8, 16), sampleMax = 5L,
      dims = dims4)
    assert(k1.meanRecallE6 < 800000L,
      s"fixture broken: nprobe=1 should be floor-blocked: $k1")
    // ...so the 2-D gate escalates, meets the floor, and persists BOTH
    // knobs with the artifact
    val knobs = IvfPq.selectKnobsSaved(spark, d8,
      nprobeLadder = Seq(1, 2), topK = 8, kCandLadder = Seq(8, 16),
      sampleMax = 5L, dims = dims4)
    assert(knobs.nprobe === 2, s"gate must escalate past nprobe=1: $knobs")
    assert(knobs.meanRecallE6 >= 800000L, s"escalated gate unmet: $knobs")
    assert(IvfPq.loadKnobs(spark, d8) === Some(knobs),
      "2-D knobs must round-trip from dir/knobs")
  }

  test("crash-replayed append auto-heals orphan vectors without a manual repairCodes (ADVICE r17)") {
    val d5 = Files.createTempDirectory("graft_ivfpq_ah").toString + "/idx"
    IvfPq.save(emb, d5, cents, books, dims)
    val delta = emb.limit(8)
      .select((col("vec_id") + 5000000L).as("vec_id"), col("embedding"))
      .localCheckpoint()
    assert(IvfPq.appendToSaved(spark, d5, delta, dims) === 8L)
    // simulate the mid-append crash: vectors landed, codes did not
    val codesKept = spark.read.parquet(s"$d5/codes")
      .filter(col("vec_id") < 5000000L).localCheckpoint()
    codesKept.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$d5/codes")
    // the REPLAYED append — no manual heal in between — must find the
    // orphans, code them, and append nothing new
    assert(IvfPq.appendToSaved(spark, d5, delta, dims) === 0L,
      "replayed append re-appended already-stored vectors")
    assert(spark.read.parquet(s"$d5/vectors").groupBy("vec_id").count()
      .filter(col("count") > 1L).count() === 0L,
      "crash replay without manual repairCodes duplicated vector rows")
    // and the orphans are now CODED (the auto-heal ran): codes ≡ the
    // ad-hoc encode of the full union
    assert(spark.read.parquet(s"$d5/codes")
      .filter(col("vec_id") >= 5000000L).count() === 8L,
      "auto-heal did not code the orphan vectors")
  }

  test("lazy 2-D gate: a floor-meeting first rung pays exactly one rung's gate jobs (VERDICT r19 #5 / ADVICE r19)") {
    import spark.implicits._
    val d9 = Files.createTempDirectory("graft_ivfpq_lazy").toString + "/idx"
    val dims4 = 4
    def v(x: Long, y: Long) = Seq(x.toFloat, y.toFloat, 0f, 0f)
    // the 2-D gate fixture's PRE-append geometry: each cell-0 sample
    // query's exact top-3 is same-cell, so nprobe=1 already meets the
    // floor and the second rung must never run
    val base = (
      (0L until 5L).map(i => (i, v(i, 0L))) ++
      (10L until 14L).map(i => (i, v(1000L + (i - 10L), 0L))) ++
      (20L until 24L).map(i => (i, v(450L, 800L + (i - 20L))))
    ).toDF("vec_id", "embedding")
    val cents4 = Seq(
      Array(0L, 0L, 0L, 0L),
      Array(1000000000L, 0L, 0L, 0L),
      Array(450000000L, 800000000L, 0L, 0L))
    val books4 = graft.operators.PqIndex.fitQuantized(
      IvfPq.residuals(KMeans.quantized(base), cents4).localCheckpoint(),
      2, 4, 2, dims4)
    IvfPq.save(base, d9, cents4, books4, dims4)
    val codes = spark.read.parquet(s"$d9/codes").localCheckpoint()
    val vectors = spark.read.parquet(s"$d9/vectors").localCheckpoint()
    def countJobs(body: => IvfPq.Knobs): (IvfPq.Knobs, Int) = {
      val n = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          n.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try { val k = body; Thread.sleep(400); (k, n.get()) }
      finally spark.sparkContext.removeSparkListener(listener)
    }
    val (k1, j1) = countJobs(IvfPq.selectKnobs(codes, vectors, cents4,
      books4, nprobeLadder = Seq(1), topK = 3, kCandLadder = Seq(8),
      sampleMax = 5L, dims = dims4))
    assert(k1.meanRecallE6 >= 800000L,
      s"fixture broken: nprobe=1 should meet the floor pre-append: $k1")
    val (k2, j2) = countJobs(IvfPq.selectKnobs(codes, vectors, cents4,
      books4, nprobeLadder = Seq(1, 2), topK = 3, kCandLadder = Seq(8),
      sampleMax = 5L, dims = dims4))
    assert(k2 === k1, "the lazy ladder changed the chosen knobs")
    assert(j2 === j1,
      s"a floor-meeting first rung must short-circuit the ladder: " +
        s"1-rung gate ran $j1 jobs, 2-rung gate ran $j2")
  }

  test("loadKnobs survives the crashed-overwrite windows: zero-row parquet and zero-file directory read as None (ADVICE r19)") {
    import spark.implicits._
    val d10 = Files.createTempDirectory("graft_ivfpq_knobs").toString + "/idx"
    // zero-row parquet (a legacy overwrite that died mid-write)
    Seq((1, 1, 1, 1L, 1L))
      .toDF("nlist", "k_cand", "nprobe", "sample_n", "mean_recall_e6")
      .filter(lit(false))
      .write.mode("overwrite").parquet(s"$d10/knobs")
    assert(IvfPq.loadKnobs(spark, d10) === None,
      "zero-row knobs must read as None, not crash serving")
    // zero-FILE directory (crash between mkdir and the first part file)
    val p = new org.apache.hadoop.fs.Path(s"$d10/knobs")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    fs.mkdirs(p)
    assert(IvfPq.loadKnobs(spark, d10) === None,
      "zero-file knobs dir must read as None, not crash serving")
    // and the staged writer cannot leave either state behind: a write
    // publishes atomically and round-trips
    val knobs = IvfPq.Knobs(4, 16, 2, 5L, 900000L)
    val wk = classOf[IvfPq.type].getDeclaredMethods
      .find(_.getName == "writeKnobs").get
    wk.setAccessible(true)
    wk.invoke(IvfPq, spark, d10, knobs)
    assert(IvfPq.loadKnobs(spark, d10) === Some(knobs))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$d10/knobs.staging")),
      "staged knobs write must clean up its staging dir")
  }

  test("retrainDeeper: a floor-blocked artifact retrains itself to a finer code budget and clears the flag (VERDICT r19 #1)") {
    import spark.implicits._
    val d11 = Files.createTempDirectory("graft_ivfpq_deep").toString + "/idx"
    val dims16 = 16
    // 64 hypercube-corner vectors (coords ∈ {0, 4} per dim, seeded):
    // at m=16/k=4 every per-dim codebook represents both coordinate
    // values EXACTLY (ADC ≡ exact distance → recall 1.0), while at
    // m=1 four joint codewords must cover ~64 distinct corners — the
    // candidate cut then runs on massively collided ADC ties and no
    // (nprobe, kCand) pair in the ladders can meet the floor. One
    // cell (min=max nlist=1) removes the coarse-probe lever entirely,
    // so the CODE BUDGET is provably the only knob left — exactly the
    // state the 2-D gate's honest failure mode leaves behind.
    val rnd = new scala.util.Random(7)
    val base = (0L until 64L).map(i =>
      (i, Seq.fill(dims16)((rnd.nextInt(2) * 4).toFloat)))
      .toDF("vec_id", "embedding")
    val q = graft.operators.KMeans.quantized(base).localCheckpoint()
    val cents1 = KMeans.fitQ(q, 1, 2, dims16)
    val books1 = graft.operators.PqIndex.fitQuantized(
      IvfPq.residuals(q, cents1).localCheckpoint(), 1, 4, 2, dims16)
    IvfPq.save(base, d11, cents1, books1, dims16)
    val nprobeL = Seq(1)
    val kCandL = Seq(3, 6)
    // precondition: the 2-D gate saturates flagged at m=1 — its widest
    // pair still misses the floor (the r19 "serve widest, stay
    // flagged" terminal state)
    val blocked = IvfPq.selectKnobsSaved(spark, d11, nprobeL, topK = 3,
      kCandL, sampleMax = 4L, dims = dims16)
    assert(blocked.meanRecallE6 < 800000L,
      s"fixture broken: m=1 should be floor-blocked at every knob pair: $blocked")
    // the automated response: walk the m ladder, refit, re-gate, swap
    val st = IvfPq.retrainDeeper(spark, d11, mLadder = Seq(1, 4, 16),
      pqK = 4, coarseIters = 2, pqIters = 2, nprobeLadder = nprobeL,
      topK = 3, kCandLadder = kCandL, sampleMax = 4L, dims = dims16,
      targetPop = 64L, minNlist = 1, maxNlist = 1,
      current = Some(blocked))
    assert(!st.flagged,
      s"retrainDeeper must clear the flag on this fixture: $st")
    assert(st.m > 1, s"the cleared artifact must carry a deeper m: $st")
    assert(st.knobs.meanRecallE6 >= 800000L)
    // the republished artifact IS the deeper one: model m and the
    // persisted knobs both travel with it
    val (_, booksAfter) = IvfPq.loadModel(spark, d11)
    assert(booksAfter.length === st.m,
      "published artifact's m diverged from the reported status")
    assert(IvfPq.loadKnobs(spark, d11) === Some(st.knobs),
      "the final gate's knobs must persist with the deeper artifact")
    assert(!new java.io.File(d11 + ".staging").exists())
    assert(!new java.io.File(d11 + ".retired").exists())
    // and on a HEALTHY artifact the face is a no-op: no refit, same m
    val again = IvfPq.retrainDeeper(spark, d11, mLadder = Seq(1, 4, 16),
      pqK = 4, coarseIters = 2, pqIters = 2, nprobeLadder = nprobeL,
      topK = 3, kCandLadder = kCandL, sampleMax = 4L, dims = dims16,
      targetPop = 64L, minNlist = 1, maxNlist = 1,
      current = Some(st.knobs))
    assert(again.m === st.m && !again.flagged,
      s"a floor-meeting artifact must not deepen further: $again")
  }

  test("corrupt artifacts fail loud: truncated cells, gapped codebooks") {
    val bad1 = dir + "_badcells"
    spark.read.parquet(s"$dir/cents").filter(col("cell") =!= 3)
      .write.mode("overwrite").parquet(s"$bad1/cents")
    spark.read.parquet(s"$dir/books")
      .write.mode("overwrite").parquet(s"$bad1/books")
    assertThrows[IllegalArgumentException] { IvfPq.loadModel(spark, bad1) }
    val bad2 = dir + "_badbooks"
    spark.read.parquet(s"$dir/cents")
      .write.mode("overwrite").parquet(s"$bad2/cents")
    spark.read.parquet(s"$dir/books")
      .filter(!(col("m") === 1 && col("code") === 2))
      .write.mode("overwrite").parquet(s"$bad2/books")
    assertThrows[IllegalArgumentException] { IvfPq.loadModel(spark, bad2) }
  }

  test("recallStatusScoped: a narrow grant's effective recall diverges from the artifact's own gate (VERDICT r19 #7)") {
    import spark.implicits._
    val d12 = Files.createTempDirectory("graft_ivfpq_scoped").toString + "/idx"
    val dims16 = 16
    // two far-apart planted clusters → two coarse cells: A (ids 0-59,
    // near +1000 on dim 0) and B (ids 100-109, near -1000). Queries sit
    // in A, so at nprobe=1 the serving path probes A's cell only. A
    // grant covering ONLY B's docs then has its entire exact top-k
    // (within the grant, i.e. B docs — what a slice-built index would
    // return) outside the probed cell: the scoped pre-filter leaves no
    // allowed candidate, effective recall 0, flagged — while the
    // UNSCOPED gate on the same artifact at the same knobs is perfect
    // (the queries' true neighbors are in the probed cell). The two
    // measurements MUST diverge; the global one cannot see this.
    val rnd = new scala.util.Random(11)
    def cluster(ids: Range, c: Float) = ids.map(i =>
      (i.toLong, (c + rnd.nextInt(3)).toFloat +: Seq.fill(dims16 - 1)(
        rnd.nextInt(3).toFloat)))
    val base = (cluster(0 until 60, 1000f) ++ cluster(100 until 110, -1000f))
      .map { case (id, v) => (id, v.toArray) }
      .toDF("vec_id", "embedding")
    val q = KMeans.quantized(base).localCheckpoint()
    // hand-pinned centroids (the save path accepts any model): one per
    // planted cluster on dim 0, so cell membership is deterministic —
    // a 2-seed md5 fit could land both seeds in the big cluster
    val cents2 = Seq(
      Array.tabulate(dims16)(i => if (i == 0) 1000000000L else 0L),
      Array.tabulate(dims16)(i => if (i == 0) -1000000000L else 0L))
    val books2 = graft.operators.PqIndex.fitQuantized(
      IvfPq.residuals(q, cents2).localCheckpoint(), 4, 4, 2, dims16)
    IvfPq.save(base, d12, cents2, books2, dims16)
    val queries = q.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("qv"))
    val global = IvfPq.recallStatus(spark, d12, queries, k = 5,
      nprobe = 1, kCand = 70, dims = dims16, excludeSelf = true)
    assert(!global.flagged && global.recall > 0.9,
      s"fixture broken: the unscoped gate should be clean here: $global")
    val grantB = (100L until 110L).toDF("vec_id")
    val scoped = IvfPq.recallStatusScoped(spark, d12, queries, k = 5,
      nprobe = 1, kCand = 70, allowed = grantB, dims = dims16)
    assert(scoped.nQueries === 3L)
    assert(scoped.flagged && scoped.recall < 0.2,
      s"the narrow grant must measure starved under nprobe=1: $scoped")
    assert(scoped.recall < global.recall)
    // the remediation the face recommends: widen nprobe FOR THE SCOPED
    // measurement — both cells probed, the allowed candidates are back
    val widened = IvfPq.recallStatusScoped(spark, d12, queries, k = 5,
      nprobe = 2, kCand = 70, allowed = grantB, dims = dims16)
    assert(!widened.flagged && widened.recall > 0.9,
      s"nprobe=2 must restore the grant's effective recall: $widened")
    // and a grant whose docs live in the probed cell measures clean —
    // the divergence is the GRANT's geometry, not a scoped-path bug
    val grantA = (0L until 60L).toDF("vec_id")
    val aligned = IvfPq.recallStatusScoped(spark, d12, queries, k = 5,
      nprobe = 1, kCand = 70, allowed = grantA, dims = dims16)
    assert(!aligned.flagged && aligned.recall > 0.9,
      s"an aligned grant must measure clean at nprobe=1: $aligned")
  }
}
