package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{CorpusPipeline, QualityModel}

class CorpusPipelineSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // planted fixture: the real corpus has no exact duplicates, so the
  // collapse path needs its own — docs 10/11 share text, 12/13 share
  // text, 20 is unique
  private lazy val planted = Seq(
    (10L, "web", "spark table merge window batch"),
    (11L, "books", "spark table merge window batch"),
    (12L, "web", "vector data query slow plan"),
    (13L, "web", "vector data query slow plan"),
    (20L, "code", "customer orders lineitem region nation"))
    .toDF("doc_id", "source", "text")

  test("exact duplicates collapse to the min surviving doc_id") {
    val kept = CorpusPipeline.clean(planted, threshold = Long.MinValue)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(10L, 12L, 20L))
  }

  test("quality gate runs BEFORE dedup: a filtered-out twin cannot evict its copy") {
    // threshold chosen to cut doc 10's text's logit out is impossible —
    // twins share text hence logit. Instead plant DIFFERENT texts whose
    // logits straddle a threshold and verify survivors are re-keyed:
    // pick the threshold that keeps only some docs, then check every
    // keeper's logit clears it and every distinct surviving text keeps
    // exactly its min surviving id.
    val scored = QualityModel.scoreDerived(planted, "doc_id", "text", 1024)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mid = scored.values.toSeq.sorted.apply(scored.size / 2)
    val cleaned = CorpusPipeline.clean(planted, threshold = mid)
      .select("doc_id", "logit").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(cleaned.nonEmpty && cleaned.length < 5)
    assert(cleaned.forall(_._2 >= mid))
    val survivingIds = scored.filter(_._2 >= mid).keySet
    val textOf = planted.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val expectedKeepers = survivingIds.groupBy(textOf).values.map(_.min).toSet
    assert(cleaned.map(_._1).toSet === expectedKeepers)
  }

  test("split assignment matches sp1's bucket rule on the kept docs") {
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.load(spark, sf, "documents")
    val cleaned = CorpusPipeline.clean(docs)
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val buckets = docs.select(col("doc_id"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("bigint") % 100).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cleaned.foreach { case (id, split) =>
      val b = buckets(id)
      val expected = if (b < 80) "train" else if (b < 90) "val" else "test"
      assert(split === expected, s"doc $id bucket $b")
    }
    assert(cleaned.values.toSet === Set("train", "val", "test"))
  }

  test("canonical selection keeps the highest-logit cluster member, not the min id") {
    import graft.operators.{DedupOps, QualityModel}
    // two near-identical docs (share nearly all 3-grams) with different
    // ids; whichever scores higher must be the keeper regardless of id
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b = a + " lambda" // superset text: Jaccard well above 0.5
    val docs = Seq((5L, a), (9L, b)).toDF("doc_id", "text")
    val pairs = DedupOps.jaccardPairs(
      DedupOps.shingles(docs, "doc_id", "text"), threshold = 0.5)
    assert(pairs.count() === 1L, "fixture pair not detected")
    val clusters = DedupOps.connectedComponents(pairs)
    val scored = clusters.join(
      QualityModel.scoreDerived(docs, "doc_id", "text", 1024), Seq("doc_id"))
    val keeper = scored.groupBy("cluster_id")
      .agg(max(struct(col("logit"), (-col("doc_id")).as("neg_id"))).as("b"))
      .select((-col("b.neg_id")).as("keeper_id")).head().getLong(0)
    val logits = QualityModel.scoreDerived(docs, "doc_id", "text", 1024)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = if (logits(5L) > logits(9L)) 5L
      else if (logits(9L) > logits(5L)) 9L else 5L
    assert(keeper === expected,
      s"keeper $keeper, logits $logits")
  }

  test("token counts ride the cleaned rows exactly") {
    val cleaned = CorpusPipeline.clean(planted, threshold = Long.MinValue)
      .select("doc_id", "n_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(cleaned === Map(10L -> 5L, 12L -> 5L, 20L -> 5L))
  }
}
