package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IvfPq, KMeans, SimilarityOps}

/** Behavior spec for metadata-filtered vector search — the semantics
  * the oracle hash can't express alone: PRE-filtering finds passing
  * neighbors that post-filtering a fixed top-k provably misses, and
  * the filtered IVF-PQ path returns only rows passing filter ∧ probe.
  */
class FilteredSearchSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  /** Planted: the query (id 0) has 5 near-identical neighbors that
    * FAIL the filter (ids 1-5) and one farther neighbor that PASSES
    * (id 6). Post-filtering top-3 returns nothing — all three slots
    * are eaten by failing rows; pre-filtering returns id 6.
    */
  private def planted = Seq(
    (0L, Array(1.00f, 0.00f, 0f, 0f), true),
    (1L, Array(0.99f, 0.01f, 0f, 0f), false),
    (2L, Array(0.98f, 0.02f, 0f, 0f), false),
    (3L, Array(0.99f, 0.02f, 0f, 0f), false),
    (4L, Array(0.98f, 0.01f, 0f, 0f), false),
    (5L, Array(0.97f, 0.02f, 0f, 0f), false),
    (6L, Array(0.60f, 0.40f, 0f, 0f), true),
    (7L, Array(-1.00f, 0.00f, 0f, 0f), true)
  ).toDF("vec_id", "embedding", "pass")

  test("pre-filter finds the passing neighbor a post-filtered top-k misses") {
    val emb = planted.select("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    // post-filter: rank the UNFILTERED corpus, take top-3, then filter
    val post = SimilarityOps.topKCosineAgainst(emb, queries, 3)
      .join(planted.select(col("vec_id").as("neighbor_id"), col("pass")),
        Seq("neighbor_id"))
      .filter(col("pass")).select("neighbor_id").as[Long].collect().toSet
    assert(post.isEmpty,
      s"planted case broken: post-filter top-3 should be empty, got $post")
    // pre-filter: restrict the corpus FIRST
    val pre = SimilarityOps.topKCosineAgainst(
        emb.join(planted.filter(col("pass")).select(col("vec_id").as("pid")),
          col("vec_id") === col("pid"), "left_semi"),
        queries, 3)
      .select("neighbor_id").as[Long].collect().toSet
    assert(pre.contains(6L), s"pre-filter must surface id 6, got $pre")
  }

  test("filtered IVF-PQ returns only rows passing filter AND probe") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding")
    val cents = KMeans.fit(emb, k = 4, iters = 2)
    val books = IvfPq.fit(emb, cents, m = 4, k = 4, iters = 2)
    val pass = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("lang") === "en").select("doc_id")
    val passSet = pass.as[Long].collect().toSet
    val codes = IvfPq.encode(emb, cents, books)
      .join(pass, col("vec_id") === col("doc_id"), "left_semi")
    val queries = KMeans.quantized(emb).filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("qv"))
    val got = IvfPq.search(codes, queries, cents, books, nprobe = 2, k = 10)
      .collect()
    assert(got.nonEmpty)
    assert(got.forall(r => passSet(r.getAs[Long]("neighbor_id"))),
      "a filtered-out row leaked into the results")
    // probe containment, same arithmetic as IvfPqSpec
    val qvs = queries.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    got.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      val probed = cents.zipWithIndex.map { case (c, cell) =>
        (qvs(qid).zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, cell)
      }.sorted.take(2).map(_._2).toSet
      assert(rows.map(_.getAs[Int]("cell")).toSet.subsetOf(probed))
    }
  }
}
