package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural plan invariants over EVERY query entry — the scale
  * properties a 100 TB deployment depends on, asserted continuously so a
  * regression (a lost broadcast hint, a filter that stops pushing, an
  * accidental cross join) fails fast rather than surfacing as a cluster
  * incident. Complements the value-level oracle gate: these check the
  * PLAN, not the answer.
  */
class PlanInvariantsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  // Deliberate nested-loop joins:
  //  - the LIKE-against-a-pattern-column join (dp_demo.sql:236): a theta
  //    join with a 1-row broadcast build side — BNLJ is the right
  //    physical operator;
  //  - n1: the documented brute-force correctness baseline (corpus ×
  //    broadcast query set is the point of the query);
  //  - n4: the query × centroid-table probe ranking (both sides are
  //    governance/metadata-sized; the corpus itself joins on the cell id).
  //  - n5: shares n4's exact-top-k recall scaffolding (the brute
  //    corpus × broadcast-queries baseline); the served ANN side itself
  //    joins on the cell id like n4.
  //  - n6: same recall scaffolding as n5; its probe selection is the
  //    query batch × BROADCAST nlist-row centroid table (the documented
  //    searchPrunedDf shape — the corpus side still joins on cell).
  //  - pipe_golden_counts: a 1-row × 1-row cross of two scalar
  //    aggregates (the dashboard's scalar-subquery shape).
  private val bnljAllowed = Set(
    "g1_secure_view_agg", "g2_secure_view_masked_rows", "j2_view_join_recovery",
    "n1_knn_cosine", "n4_ann_ivf", "n5_ann_ivf_served", "n6_ann_ivf_batch_served",
    // n7 is n1's deliberate broadcast-tiny-query-side cross join over
    // the dequantized corpus — same bounded shape, same justification
    "n7_knn_quantized",
    // t10: the 1-row × 1-row cross of the register aggregate with the
    // true-distinct scalar (pipe_golden_counts' scalar-dashboard shape)
    "t10_distinct_sketch",
    // b2-b5: BM25 scoring crosses the postings against the ONE-ROW
    // corpus-stats aggregate (n_docs, avgdl) — a 1-row broadcast build
    // side, the scalar-dashboard shape again
    "b2_bm25_term_topk", "b3_bm25_topk", "b4_bm25_served", "b5_rrf_fusion",
    "b6_passage_topk",
    // b8 diversifies b3's candidates, so it carries b3's one-row
    // corpus-stats cross; x7 crosses the bucket counts against the
    // ONE-ROW token-total aggregate — the scalar-dashboard shape
    "b8_diversified_topk", "x7_dsir_importance",
    // d16 crosses its three 1-row census aggregates at the end —
    // the scalar-dashboard shape
    "d16_triangle_stats",
    // b9's similarity table IS a deliberate cross of two bounded-tiny
    // frames (|q-terms| × ≤dims occurring buckets) — the point of the
    // bucket-pair precompute (LateInteraction's scale note)
    "b9_maxsim_topk",
    // x9's manifest crosses five 1-row aggregates — the
    // scalar-dashboard shape
    "x9_release_manifest",
    // b10 carries b4's one-row corpus-stats cross (candidate stage)
    // and b9's bounded similarity-table cross (re-rank stage)
    "b10_maxsim_served",
    // n11 rides n1's deliberate corpus × broadcast-query-side cross
    "n11_knn_classify",
    // e16 crosses the ONE-ROW basket-count aggregate — the
    // scalar-dashboard shape
    "e16_cooccurrence",
    // e18 crosses the ONE-ROW max-day scalar
    "e18_decayed_ltv",
    // n8 is n1's deliberate corpus × broadcast-tiny-query-side cross
    // join, over the derived embeddings
    "n8_hashed_embedding_knn",
    // t37 is the same n1 shape over the token-id learned-table
    // vectors (query side fixed at 5 rows)
    "t37_token_embedding_knn",
    // n9/n10 are the same deliberate shape over the SQ-reconstructed
    // corpus (ADC keeps the query side exact and broadcast-tiny)
    "n9_sq_adc_topk", "n10_sq_adc_served",
    // n25 re-ranks against that same SQ-reconstructed tier, so it
    // inherits the n9/n10 SQ-chain shape (the codebook BUILD crosses
    // two tiny aggregates — dims×levels rows); the re-rank joins
    // themselves are equi (candidate- and query-keyed broadcasts)
    "n25_ivfpq_rerank_sq",
    // t14/t16/x5: histQuantiles crosses the ≤64-row histogram's 1-row
    // total against the literal quantile-spec rows (and x5 carries the
    // same shape per source) — every side is sketch-sized by
    // construction, the scalar-dashboard shape again
    "t14_quantile_sketch", "t16_source_quantile_sketch", "x5_lm_quantile_gate",
    // t20: the dense register table crosses the distinct-source dim
    // against the 256-row bucket range — both sides fixed-size
    "t20_source_distinct_sketch",
    // t30 densifies its per-source registers through t20's exact
    // fixed-size cross (sources × 256 buckets) before the pair algebra
    "t30_sketch_overlap",
    // sp9: per-source weights cross the ONE-ROW integer total — the
    // scalar-dashboard shape again
    "sp9_temperature_mix",
    // sp12: per-source means cross the ONE-ROW global-min scalar, then
    // the ONE-ROW weight total — sp9's scalar-dashboard shape twice
    "sp12_domain_reweight",
    // sp14: the per-source table crosses the ONE-ROW budget total and
    // the ONE-ROW waterfill remainder — the scalar-dashboard shape
    "sp14_budget_waterfill",
    // h22: rich-customer filter crosses the ONE-ROW positive-balance
    // aggregate — the scalar-dashboard shape
    "h22_idle_rich",
    // h15: the revenue table crosses its OWN 1-row max — the
    // scalar-subquery-on-aggregate shape
    "h15_top_supplier",
    // n17/n18: the corpus codes cross the broadcast query-LUT frame
    // (|queries| rows, driver-bounded) — n1/n7's deliberate
    // tiny-query-side shape; pricing a row from codes is the point
    "n17_pq_adc_topk", "n18_pq_served",
    // n21: n1's deliberate corpus × broadcast-query-side cross, over
    // the attribute-filtered corpus
    "n21_filtered_knn",
    // n29: n17/n18's deliberate codes × broadcast query-LUT cross,
    // with the LUT frame computed in-plan instead of driver-built
    "n29_pq_served_df",
    // b11: carries BOTH legs' documented shapes — b3's one-row
    // corpus-stats cross (lexical) and n8's corpus ×
    // broadcast-3-row-query cross (dense)
    "b11_hybrid_rrf",
    // t38 serves t37's n1 shape from the loaded table (query side
    // fixed at 5 rows)
    "t38_token_embedding_knn_served",
    // n30's exact-baseline side is n1's deliberate corpus ×
    // broadcast-5-row-query cross (the recall denominator)
    "n30_ivfpq_recall",
    // b12 carries b4's one-row corpus-stats cross (lexical leg) and
    // the n1-shaped corpus × broadcast-3-row-query cross (dense leg)
    "b12_hybrid_served",
    // b13 shares b12's lexical leg (the same one-row corpus-stats
    // cross); its dense leg is the cell-pruned ADC broadcast EQUI-join
    // — no cross there
    "b13_hybrid_ann_served",
    // b14 is b13 under a consumer grant: the lexical leg's SCOPED
    // stats are still a one-row broadcast cross; both legs' grant
    // filters are semi EQUI-joins (HybridServeSpec plan-asserts the
    // dense one sits under the LUT join)
    "b14_hybrid_filtered",
    "pipe_golden_counts")

  test("no query entry plans a cartesian product; BNLJ only for the LIKE join") {
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val p = plan(name)
      assert(!p.contains("CartesianProduct"),
        s"$name plans a cartesian product:\n${p.take(1500)}")
      if (!bnljAllowed(name))
        assert(!p.contains("BroadcastNestedLoopJoin"),
          s"$name plans an unexpected nested-loop join:\n${p.take(1500)}")
    }
  }

  test("range/equality filters reach the parquet scan (PushedFilters)") {
    val p = plan("p4_filter_range")
    assert("PushedFilters: \\[[^\\]]".r.findFirstIn(p).isDefined,
      "no pushed filters in:\n" + p.take(1200))
  }

  test("projection prunes the scan to the referenced columns (ReadSchema)") {
    val p = plan("p1_projection")
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).map(_.group(1))
    assert(read.isDefined, p.take(1200))
    // p1 touches exactly 4 lineitem columns; a scan reading more is a
    // pruning regression
    assert(read.get.split(",").length <= 4, s"scan reads too much: ${read.get}")
  }

  test("j1 broadcasts every dimension — the fact shuffles only on its join key") {
    val p = plan("j1_join_multiway")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p.take(1200))
  }

  test("e7's hot-set salt assignment rides BROADCAST joins, never a shuffle") {
    // the two-phase salted join's whole premise is that the hot set is
    // broadcast-sized; if either side's salt assignment ever plans as a
    // shuffled join, the operator's cost model is broken
    val p = plan("e7_interval_join_salted_hot")
    assert("BroadcastHashJoin.*LeftOuter".r.findAllIn(p).size >= 2,
      s"hot-set assignment not broadcast on both sides:\n${p.take(1500)}")
  }

  test("h5 broadcasts its un-hinted sides at test scale — the planner, not a hint, decides") {
    // customer and supplier carry NO broadcast() hint (they are
    // fact-scale at 100 TB and must be free to shuffle); at test SF the
    // size estimates put them under the threshold, so the planner still
    // broadcasts every non-fact side. Losing these would mean the
    // planner stopped seeing the sizes — a regression worth failing on.
    val p = plan("h5_local_supplier")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4,
      s"h5 expected >=4 planner-chosen broadcasts:\n${p.take(1500)}")
  }

  test("h18's HAVING survivors broadcast into the re-join; the lineitem agg is map-side partial") {
    // the survivor set (orders past the quantity threshold) is tiny by
    // construction but GROWS with sf, so it carries no hint — the size
    // estimate must still choose the broadcast at test scale (and AQE
    // from actual sizes beyond); if the estimate ever stops seeing it,
    // the query silently degenerates at test SF and that's worth a red
    val p = plan("h18_large_orders")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 1,
      s"h18 survivor set not broadcast:\n${p.take(1500)}")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"h18 lineitem aggregation lost its partial (map-side) phase:\n${p.take(1500)}")
  }

  test("h9/h17 build sides broadcast WITHOUT hints — the planner, not a hint, decides") {
    // part (name/brand-filtered — a constant fraction of a scaling
    // relation) and supplier are un-hinted by the h5 rule; at test SF
    // the size estimates put them under the threshold, so the planner
    // must still pick BroadcastHashJoin on its own. h9 needs three
    // (part, supplier, hinted nation), h17 one (filtered part).
    val p9 = plan("h9_product_profit")
    assert("BroadcastHashJoin".r.findAllIn(p9).size >= 3,
      s"h9 expected >=3 planner-chosen broadcasts:\n${p9.take(1500)}")
    val p17 = plan("h17_small_quantity_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p17).size >= 1,
      s"h17 filtered part not broadcast:\n${p17.take(1500)}")
  }

  test("h1 is one selective scan: filter pushed, aggregation map-side partial") {
    val p = plan("h1_pricing_summary")
    assert("PushedFilters: \\[[^\\]]".r.findFirstIn(p).isDefined,
      s"h1 shipdate filter not pushed:\n${p.take(1200)}")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"h1 lost its partial (map-side) aggregate phase:\n${p.take(1200)}")
  }

  test("h4/h21/h22 plan their EXISTS/NOT-EXISTS as semi/anti joins, never dedup-then-inner") {
    assert("LeftSemi".r.findFirstIn(plan("h4_priority_returns")).isDefined,
      "h4 EXISTS must plan as a left-semi join")
    val p21 = plan("h21_sole_blame")
    assert("LeftSemi".r.findFirstIn(p21).isDefined &&
      "LeftAnti".r.findFirstIn(p21).isDefined,
      s"h21 must carry BOTH a semi (co-supplier exists) and an anti (no co-fault) leg:\n${p21.take(1500)}")
    val p22 = plan("h22_idle_rich")
    assert("LeftAnti".r.findFirstIn(p22).isDefined,
      s"h22 NOT EXISTS must plan as a left-anti join:\n${p22.take(1500)}")
    assert("PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(o_orderdate".r.findFirstIn(p22).isDefined,
      s"h22 order-date window must push into the orders scan:\n${p22.take(1500)}")
  }

  test("ANALYZE-fed column stats drive a broadcast the file-size estimate alone would miss") {
    // The CBO path for catalog tables: without statistics a FILTERED
    // dimension is sized at its full file size (Filter passes the
    // child's sizeInBytes through), so a selective filter cannot
    // rescue a dimension that is over the broadcast threshold; with
    // `ANALYZE TABLE ... FOR COLUMNS` + spark.sql.cbo.enabled the
    // filter's selectivity (1/ndv on an equality) shrinks the
    // estimate and the SAME un-hinted query plans a BroadcastHashJoin.
    // This is the production-grade form of the h-family's "no hint on
    // scaling dims" rule: statistics, not hints, pick the build side.
    val s = spark.newSession()
    s.conf.set("spark.sql.cbo.enabled", "true")
    // threshold chosen between the two estimates: the no-stats path
    // sizes the pruned scan at file size × column ratio (~12 KB here —
    // Project scales by width even without CBO), while the stats path
    // sizes the filtered output at ~60 rows × avg row width (~3 KB)
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", (4 * 1024).toString)
    val sf01 = "/root/testdata/sf0.01"
    Tables.load(s, sf01, "customer").write.mode("overwrite")
      .saveAsTable("cbo_customer")
    Tables.load(s, sf01, "orders").write.mode("overwrite")
      .saveAsTable("cbo_orders")
    try {
      val q = """SELECT o.o_orderkey, c.c_name
                 FROM cbo_orders o JOIN cbo_customer c
                   ON o.o_custkey = c.c_custkey
                 WHERE c.c_nationkey = 3"""
      val before = s.sql(q).queryExecution.executedPlan.toString
      assert(!before.contains("BroadcastHashJoin"),
        s"filtered dim broadcast WITHOUT stats — threshold not exercised:\n${before.take(1500)}")
      s.sql("ANALYZE TABLE cbo_customer COMPUTE STATISTICS")
      s.sql("ANALYZE TABLE cbo_customer COMPUTE STATISTICS FOR COLUMNS c_custkey, c_nationkey")
      val after = s.sql(q).queryExecution.executedPlan.toString
      assert(after.contains("BroadcastHashJoin"),
        s"stats + CBO did not produce a broadcast:\n${after.take(1500)}")
    } finally {
      s.sql("DROP TABLE IF EXISTS cbo_customer")
      s.sql("DROP TABLE IF EXISTS cbo_orders")
    }
  }
}
