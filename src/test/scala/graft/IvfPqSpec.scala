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

  test("exact re-rank recovers a neighbor ADC misses") {
    import spark.implicits._
    // one coarse cell at the origin (residual = vector), per-subspace
    // codewords {(0,0), (10,10)} in e6 units; query at the origin.
    //   A = (5.5, 5.5, 5.5, 5.5): exact dist2 121 — the TRUE top-1 —
    //       but both subspaces code to (10,10), so ADC prices it 400;
    //   B = (0, 0, 11, 11): exact dist2 242, but subspace codes
    //       (0,0)/(10,10) price it 200 — ADC's (wrong) top-1.
    // Codes-only search at k=1 returns B; the re-rank tail over the
    // stored exact vectors returns A.
    val e6 = 1000000L
    val oneCent = Seq(Array(0L, 0L, 0L, 0L))
    val books = Seq(
      Seq(Array(0L, 0L), Array(10L * e6, 10L * e6)),
      Seq(Array(0L, 0L), Array(10L * e6, 10L * e6)))
    val corpus = Seq(
      (1L, Array(5.5f, 5.5f, 5.5f, 5.5f)),
      (2L, Array(0.0f, 0.0f, 11.0f, 11.0f))
    ).toDF("vec_id", "embedding")
    val q = KMeans.quantized(corpus)
    val codes = graft.operators.PqIndex.encodeQ(
      IvfPq.residuals(q, oneCent), books, dims = 4, carry = Seq("cell"))
    val queries = Seq((100L, Seq(0L, 0L, 0L, 0L)))
      .toDF("query_id", "qv")
    val adcTop = IvfPq.search(codes, queries, oneCent, books,
      nprobe = 1, k = 1, dims = 4).collect()
    assert(adcTop.map(_.getAs[Long]("neighbor_id")).toSeq === Seq(2L),
      "the planted case must make ADC pick the exact-wrong neighbor")
    val rerTop = IvfPq.searchRerank(codes, q, queries, oneCent, books,
      nprobe = 1, kCand = 2, k = 1, dims = 4).collect()
    assert(rerTop.map(_.getAs[Long]("neighbor_id")).toSeq === Seq(1L),
      "re-rank must recover the exact nearest neighbor")
    assert(rerTop.head.getAs[Long]("dist2") === 121L * e6 * e6)
  }

  test("re-rank output on the real table is the exact re-ordering of its own candidates") {
    val queries = KMeans.quantized(emb).filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("qv"))
    val codes = IvfPq.encode(emb, cents, books)
    val q = KMeans.quantized(emb)
    val kCand = 15
    val cand = IvfPq.search(codes, queries, cents, books, nprobe = 2,
        k = kCand).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rer = IvfPq.searchRerank(codes, q, queries, cents, books,
      nprobe = 2, kCand = kCand, k = 5).collect()
    // every re-ranked row is one of the ADC candidates
    assert(rer.forall(r => cand((r.getLong(0), r.getLong(1)))))
    // and per query the exact distances are non-decreasing in rnk
    rer.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byRnk = rows.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Long]("dist2"))
      assert(byRnk.zip(byRnk.tail).forall { case (a, b) => a <= b })
    }
  }

  test("planted separated clusters: full-probe recall of cluster-mates is perfect") {
    // three tight, well-separated clusters: a member's exact nearest
    // neighbors ARE its cluster-mates, and with a codeword per cluster
    // available the ADC ranking must recover every mate before any
    // out-cluster vector (quantization error is intra-cluster only,
    // inter-cluster distances dominate)
    import spark.implicits._
    val base = Seq(
      Array(2f, 2f, 0f, 0f), Array(-2f, 2f, 0f, 0f), Array(0f, -2f, 2f, 0f))
    val planted = (0 until 24).map { i =>
      val c = base(i % 3)
      (i.toLong, Array(c(0) + 0.01f * (i / 3), c(1) - 0.01f * (i / 3),
        c(2) + 0.005f * (i / 3), c(3)))
    }.toDF("vec_id", "embedding")
    val pCents = KMeans.fit(planted, k = 3, iters = 3, dims = 4)
    val pBooks = IvfPq.fit(planted, pCents, m = 2, k = 4, iters = 2, dims = 4)
    val codes = IvfPq.encode(planted, pCents, pBooks, dims = 4)
    val queries = KMeans.quantized(planted).filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("qv"))
    val got = IvfPq.search(codes, queries, pCents, pBooks,
        nprobe = 3, k = 7, dims = 4)
      .collect().groupBy(_.getLong(0))
    (0L until 3L).foreach { qid =>
      val mates = (0 until 24).map(_.toLong)
        .filter(v => v % 3 == qid % 3 && v != qid).toSet
      val found = got(qid).map(_.getAs[Long]("neighbor_id")).toSet
      assert(found === mates, s"query $qid: expected mates $mates, got $found")
    }
  }

  test("probe sets nest, so the CANDIDATE set (and its recall) is monotone in nprobe") {
    // the monotone object is the candidate set — the final ADC top-k
    // is NOT monotone in nprobe (a wider probe can surface an
    // approximately-closer candidate that displaces a true neighbor),
    // which is exactly why serving tiers tune nprobe against a recall
    // target rather than assuming more probing only helps
    val queries = KMeans.quantized(emb).filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("qv"))
    val codes = IvfPq.encode(emb, cents, books)
    val bigK = 10000 // >= corpus: the "top-k" IS the candidate set
    val cands = Seq(1, 2, 4).map { np =>
      IvfPq.search(codes, queries, cents, books, np, k = bigK)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(cands(0).subsetOf(cands(1)) && cands(1).subsetOf(cands(2)),
      "candidate sets must nest as nprobe widens")
    assert(cands(0).size < cands(2).size,
      "widening the probe set must actually add candidates on this data")
  }

  test("residual fit and encode are partition-invariant") {
    val books2 = IvfPq.fit(emb.repartition(7), cents, m, k, iters)
    assert(books.map(_.map(_.toSeq)) === books2.map(_.map(_.toSeq)),
      "residual codebooks drifted under repartitioning")
    val enc1 = IvfPq.encode(emb, cents, books)
      .orderBy("vec_id").collect().map(_.toString).toSeq
    val enc2 = IvfPq.encode(emb.repartition(5), cents, books)
      .orderBy("vec_id").collect().map(_.toString).toSeq
    assert(enc1 === enc2)
  }

  test("searchDf ≡ search bit-identity, zero driver collect of query vectors, plan flat in batch size") {
    val codes = IvfPq.encode(emb, cents, books).localCheckpoint()
    val q = KMeans.quantized(emb).localCheckpoint()
    def queries(n: Int) = q.filter(col("vec_id") < n)
      .select(col("vec_id").as("query_id"), col("qv"))

    // bit-identity with the driver-LUT face, both self-exclusion modes
    for (ex <- Seq(true, false)) {
      val drv = IvfPq.search(codes, queries(3), cents, books,
        nprobe = 2, k = 10, excludeSelf = ex).collect().map(_.toString).toSeq
      val df = IvfPq.searchDf(codes, queries(3), cents, books,
        nprobe = 2, k = 10, excludeSelf = ex).collect().map(_.toString).toSeq
      assert(df === drv, s"searchDf diverged from search (excludeSelf=$ex)")
    }
    // and the two-stage faces agree
    val drvR = IvfPq.searchRerank(codes, q, queries(3), cents, books,
      nprobe = 2, kCand = 10, k = 5).collect().map(_.toString).toSeq
    val dfR = IvfPq.searchRerankDf(codes, q, queries(3), cents, books,
      nprobe = 2, kCand = 10, k = 5).collect().map(_.toString).toSeq
    assert(dfR === drvR, "searchRerankDf diverged from searchRerank")
    // the huge-batch LUT-join shape (broadcastLuts=false — shuffle join
    // on cell instead of broadcasting the m·k-array LUT rows, ADVICE
    // r17) is value-identical to the default broadcast shape
    val dfShuffle = IvfPq.searchDf(codes, queries(3), cents, books,
        nprobe = 2, k = 10, broadcastLuts = false)
      .collect().map(_.toString).toSeq
    val dfBcast = IvfPq.searchDf(codes, queries(3), cents, books,
        nprobe = 2, k = 10).collect().map(_.toString).toSeq
    assert(dfShuffle === dfBcast,
      "broadcastLuts=false diverged from the broadcast LUT join")
    // ... and the flag now reaches the RE-RANK TAIL too (ADVICE r18):
    // with broadcastLuts=false the candidate list and query batch join
    // the vector store by shuffle, so the two-stage path is also safe
    // at batch sizes past the broadcast limit — values unchanged
    val dfRShuffle = IvfPq.searchRerankDf(codes, q, queries(3), cents,
        books, nprobe = 2, kCand = 10, k = 5, broadcastLuts = false)
      .collect().map(_.toString).toSeq
    assert(dfRShuffle === dfR,
      "non-broadcast rerankTail diverged from the broadcast tail")

    // ZERO driver round-trips at plan time: constructing the searchDf
    // plan launches no Spark jobs (search's driver LUT build collects
    // the batch — this is the property that caps it)
    var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    val plan8 =
      try {
        val p = IvfPq.searchDf(codes, queries(8), cents, books,
          nprobe = 2, k = 10).queryExecution.executedPlan.toString
        Thread.sleep(300)
        p
      } finally spark.sparkContext.removeSparkListener(listener)
    assert(jobs === 0, s"searchDf plan construction launched $jobs jobs")
    // no collected LUT rows anywhere in the plan (search's signature)
    assert(!plan8.contains("LocalTableScan"),
      s"searchDf plan contains driver-built rows:\n${plan8.take(1500)}")
    // plan size flat in batch size: the batch enters as a relation, not
    // as literals, so an 8× batch prices the identical plan
    val plan1 = IvfPq.searchDf(codes, queries(1), cents, books,
      nprobe = 2, k = 10).queryExecution.executedPlan.toString
    assert(plan1.length === plan8.length,
      s"plan grew with batch size: ${plan1.length} -> ${plan8.length}")
    // still the broadcast equi-join pruning shape
    assert(plan8.contains("BroadcastHashJoin") &&
      !plan8.contains("CartesianProduct"),
      s"searchDf lost the pruned-join shape:\n${plan8.take(1500)}")
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
