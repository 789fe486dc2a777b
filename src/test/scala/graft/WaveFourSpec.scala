package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bm25, Dsir}

/** Semantic invariants for the fourth-wave entries (e9 retention
  * cohorts, t22 BPE merge step, d14 cross-source overlap, x7 DSIR
  * importance, b8 diversified top-k). The strong gate is the DuckDB
  * oracle; these pin the properties the hash compare can't state.
  */
class WaveFourSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("e9: week-0 retention is exactly 1.0 for every cohort; retention never exceeds it") {
    val df = SparkEntry.queries("e9_retention_cohorts")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val w0 = rows.filter(_.getAs[Int]("week_offset") == 0)
    // every user is active in their own first week
    assert(w0.nonEmpty)
    w0.foreach { r =>
      assert(r.getAs[Long]("n_active") === r.getAs[Long]("cohort_size"))
      assert(r.getAs[Double]("retention") === 1.0)
    }
    rows.foreach { r =>
      assert(r.getAs[Double]("retention") <= 1.0)
      assert(r.getAs[Int]("week_offset") >= 0)
    }
  }

  test("t22: merge candidates are character PAIRS with non-increasing weighted counts") {
    val rows = SparkEntry.queries("t22_bpe_merge")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("pair").length == 2))
    val cnts = rows.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Long]("cnt"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
  }

  test("d14: full source-pair matrix with set-algebra bounds intact") {
    val rows = SparkEntry.queries("d14_cross_source_overlap")(spark, sf).collect()
    // 20 sources in the testdata -> C(20,2) pairs when every pair overlaps
    assert(rows.length === 190)
    rows.foreach { r =>
      val (nc, n1, n2) = (r.getAs[Long]("n_common"),
        r.getAs[Long]("n1"), r.getAs[Long]("n2"))
      assert(r.getAs[String]("s1") < r.getAs[String]("s2"))
      assert(nc >= 1 && nc <= math.min(n1, n2))
      val j = r.getAs[Long]("jaccard_e6")
      assert(j >= 0 && j <= 1000000)
    }
  }

  test("x7: planted target-vocabulary docs outrank off-target docs; no target doc is scored") {
    // target source speaks 'alpha beta'; raw docs either echo that
    // vocabulary or speak disjoint 'zeta eta' — DSIR must prefer the
    // echoes regardless of doc ids.
    val docs = Seq(
      (1L, "tgt", "alpha beta alpha beta alpha beta"),
      (2L, "tgt", "beta alpha beta alpha"),
      (10L, "raw", "alpha beta alpha beta"),
      (11L, "raw", "zeta eta zeta eta"),
      (12L, "raw", "alpha zeta beta eta")
    ).toDF("doc_id", "source", "text")
    val sc = Dsir.importanceScores(docs, "doc_id", "text", "source", Seq("tgt"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_e6"))
      .toMap
    assert(sc.keySet === Set(10L, 11L, 12L))
    assert(sc(10L) > sc(12L) && sc(12L) > sc(11L))
    assert(sc(10L) > 0 && sc(11L) < 0)

    val entry = SparkEntry.queries("x7_dsir_importance")(spark, sf).collect()
    val rnk = entry.map(_.getAs[Int]("rnk"))
    assert(rnk.toSeq === (1 to entry.length))
    val tgtDocs = graft.Tables.load(spark, sf, "documents")
      .filter(col("source").isin("src0", "src1"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(entry.forall(r => !tgtDocs(r.getAs[Long]("doc_id"))))
  }

  test("b8: at most one doc per (query, source), and every pick comes from the b3 candidate pool") {
    val df = SparkEntry.queries("b8_diversified_topk")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val perQS = rows.groupBy(r =>
      (r.getAs[Long]("query_id"), r.getAs[String]("source")))
    assert(perQS.values.forall(_.length == 1))
    // candidate pool: full-scoring top-15 per query
    val queries = Seq((0L, "spark table merge"),
      (1L, "vector data window batch"), (2L, "customer query slow"))
    val pool = Bm25.topK(graft.Tables.load(spark, sf, "documents"),
        "doc_id", "text", queries, 15)
      .select("query_id", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.forall(r =>
      pool((r.getAs[Long]("query_id"), r.getAs[Long]("doc_id")))))
  }

  test("d15: star-graph center outranks leaves; mass stays within floor-rounding of n") {
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
      .toDF("d1", "d2")
    val pr = graft.operators.PageRank.pagerank(star, iters = 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pr_e9"))
      .toMap
    assert(pr.keySet === Set(1L, 2L, 3L, 4L, 5L))
    assert(Seq(2L, 3L, 4L, 5L).forall(l => pr(1L) > pr(l)))
    // every node has deg >= 1, so no dangling leakage: total mass is
    // n*1e9 minus only integer-floor crumbs
    val total = pr.values.sum
    assert(total <= 5L * 1000000000L)
    assert(total > (5L * 1000000000L * 99L) / 100L)
    val entry = SparkEntry.queries("d15_dup_pagerank")(spark, sf).collect()
    assert(entry.nonEmpty)
    assert(entry.forall(_.getAs[Long]("pr_e9") >= 150000000L))
  }

  test("d19: PPR mass decays with distance from the seed and never reaches another component") {
    import spark.implicits._
    // path 1-2-3-4 plus a DISCONNECTED pair 10-11; seed = {1}
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("d1", "d2")
    val ppr = graft.operators.PageRank.personalized(g, Seq(1L), iters = 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pr_e9"))
      .toMap
    // decay is with DISTANCE at equal degree (a raw seed-vs-neighbor
    // compare is invalid: the deg-2 interior node 2 legitimately
    // outranks the deg-1 seed, which gives all its mass away each
    // round): interior pair 2 (dist 1) vs 3 (dist 2), endpoint pair
    // 1 (dist 0) vs 4 (dist 3)
    assert(ppr(2L) > ppr(3L) && ppr(1L) > ppr(4L),
      s"rank must decay with distance at matched degree: $ppr")
    assert(ppr(10L) === 0L && ppr(11L) === 0L,
      "an unreachable component must hold rank 0 — unreachable means unrelated")
    val entry = SparkEntry.queries("d19_personalized_pagerank")(spark, sf).collect()
    assert(entry.count(_.getAs[Boolean]("is_seed")) === 3)
    assert(entry.filter(_.getAs[Boolean]("is_seed"))
      .forall(_.getAs[Long]("pr_e9") >= 150000000L))
  }

  test("e10: SCD2 versions tile each user's history with alternating states") {
    val rows = SparkEntry.queries("e10_scd2_intervals")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    byUser.foreach { case (u, vs) =>
      val sorted = vs.sortBy(_.getAs[Long]("version_idx"))
      assert(sorted.head.getAs[Long]("version_idx") === 1L, s"user $u")
      // exactly one open (current) version, and it is the last
      assert(sorted.count(_.getAs[Int]("is_current") == 1) === 1, s"user $u")
      assert(sorted.last.getAs[Int]("is_current") === 1, s"user $u")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // intervals tile: each version closes where the next opens
          assert(a.getAs[java.time.LocalDateTime]("valid_to") ===
            b.getAs[java.time.LocalDateTime]("valid_from"), s"user $u")
          // a version only exists because the state CHANGED
          assert(a.getAs[String]("state") !== b.getAs[String]("state"),
            s"user $u")
        case _ => ()
      }
    }
    val nEvents = rows.map(_.getAs[Long]("n_events")).sum
    val total = graft.Tables.load(spark, sf, "events").count()
    assert(nEvents === total)
  }
}
