package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextQueries

/** Hand-computable planted cases for the text-analysis operators whose
  * semantics aren't obvious from the oracle SQL alone — currently the
  * Gopher-style repetition metrics (t8). The oracle pins cross-engine
  * equality on the real corpus; this pins the NUMBERS mean what the doc
  * says on inputs small enough to verify by hand.
  */
class TextSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("repetition metrics match hand-computed values on planted docs") {
    val docs = Seq(
      // "ab ab" x3 is the top 2-gram; too short for any 5-gram
      (1L, "ab ab ab ab"),
      // perfectly periodic: top2 "x y" x4 covers 12/15 chars; both
      // 5-grams repeat, overlap pushes dup5_frac past 1 (36/15)
      (2L, "x y x y x y x y"),
      // single token: no grams at all, everything zero
      (3L, "solo"),
      // all 2-grams tie at cnt 1 -> lexicographically smallest wins;
      // no duplicate 5-grams
      (4L, "a b c d e f"))
      .toDF("doc_id", "text")
    val got = TextQueries.repetitionMetrics(docs).orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3),
        r.getDouble(4), r.getLong(5), r.getDouble(6)))
    assert(got.toSeq === Seq(
      (1L, 11, 3L, "ab ab", 15.0 / 11, 0L, 0.0),
      (2L, 15, 4L, "x y", 12.0 / 15, 36L, 36.0 / 15),
      (3L, 4, 0L, "", 0.0, 0L, 0.0),
      (4L, 11, 1L, "a b", 3.0 / 11, 0L, 0.0)))
  }

  test("corpus stats: exact median (odd and even n) and p90 by rank arithmetic") {
    // source A: token counts [1, 2, 3, 4] -> even n, median (2+3)/2,
    // p90 at rank ceil(3.6) = 4 -> 4; source B: [5, 7, 9] -> odd n,
    // both middle ranks coincide at 7, p90 at rank ceil(2.7) = 3 -> 9
    val docs = Seq(
      (1L, "A", "w"), (2L, "A", "w w"), (3L, "A", "w w w"),
      (4L, "A", "w w w w"),
      (5L, "B", "w w w w w"), (6L, "B", "w w w w w w w"),
      (7L, "B", "w w w w w w w w w"))
      .toDF("doc_id", "source", "text")
    val got = TextQueries.corpusStats(docs).orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3),
        r.getInt(4), r.getDouble(5), r.getDouble(6), r.getInt(7)))
    assert(got.toSeq === Seq(
      ("A", 4L, 10L, 1, 4, 2.5, 2.5, 4),
      ("B", 3L, 21L, 5, 9, 7.0, 7.0, 9)))
  }

  test("portable HLL sketch lands within 3 sigma of the true distinct count") {
    // 256 registers -> sigma = 1.04/sqrt(256) = 6.5%; the corpus's
    // ~16.5k distinct 3-grams are far past the raw-regime floor
    // (2.5 * m = 640), so the uncorrected estimate applies
    val r = SparkEntry.queries("t10_distinct_sketch")(
      spark, "/root/testdata/sf0.001").collect().head
    val (est, truth) = (r.getDouble(3), r.getLong(4))
    assert(truth > 2.5 * 256, s"corpus too small for the raw regime: $truth")
    assert(math.abs(est - truth) / truth < 3 * 0.065,
      s"estimate $est vs true $truth outside 3 sigma")
  }

  test("count-min estimates are one-sided: never below the true count") {
    val rows = SparkEntry.queries("t11_heavy_hitters")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val (truth, est, over) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(est >= truth, s"count-min UNDER-estimated ${r.getString(0)}")
      assert(over === est - truth)
    }
  }

  test("log-histogram sketch is mergeable: hist(A ++ B) == bucket-wise sum of parts") {
    import graft.operators.Sketches
    val a = Seq(1L, 2L, 3L, 7L, 8L, 100L).toDF("v")
    val b = Seq(4L, 9L, 1000L, 0L).toDF("v")
    def m(df: org.apache.spark.sql.DataFrame) =
      Sketches.logHistogram(df).collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val merged = (m(a).keySet ++ m(b).keySet).map(k =>
      k -> (m(a).getOrElse(k, 0L) + m(b).getOrElse(k, 0L))).toMap
    assert(m(a.unionAll(b)) === merged)
    // bucket index is floor(log2): 1->0, 2,3->1, 7->2, 8->3, 100->6, 0->-1
    assert(m(a) === Map(0 -> 1L, 1 -> 2L, 2 -> 1L, 3 -> 1L, 6 -> 1L))
    assert(m(b) === Map(-1 -> 1L, 2 -> 1L, 3 -> 1L, 9 -> 1L))
  }

  test("sketch quantile envelopes contain the exact quantiles (t9 cross-check)") {
    import graft.operators.Sketches
    val sf = "/root/testdata/sf0.001"
    val vals = graft.Tables.load(spark, sf, "documents")
      .selectExpr("CAST(size(split(text, ' ')) AS BIGINT) AS v")
    val sorted = vals.collect().map(_.getLong(0)).sorted
    val qs = Seq((1, 2), (9, 10), (99, 100))
    val got = Sketches.histQuantiles(Sketches.logHistogram(vals), qs)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(4), r.getLong(5)))).toMap
    qs.foreach { case (nu, de) =>
      val (rank, lo, hi) = got((nu, de))
      val exact = sorted((rank - 1).toInt) // rank is 1-based ceil(q*n)
      assert(rank === (nu.toLong * sorted.length + de - 1) / de)
      assert(exact >= lo && exact <= hi,
        s"q=$nu/$de exact $exact outside envelope [$lo, $hi]")
      assert(hi < 2 * exact.max(1L) * 2, "2x relative-error envelope")
    }
  }
}
