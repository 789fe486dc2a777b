package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank in exact integer arithmetic — graph
  * centrality over relations the pipeline already produces (the d2
  * near-dup pair graph: which documents sit at the CENTER of a
  * duplication neighborhood vs. on its fringe — a canonical-selection
  * signal orthogonal to x4's quality argmax).
  *
  * Arithmetic contract (the repo's cross-engine discipline): ranks are
  * e9 fixed-point BIGINTs. One step is
  *
  *   r'(v) = (1−d)·1e9 + (d_num · Σ_{u→v} (r(u) div deg(u))) div d_den
  *
  * with d = 85/100. Every operation is BIGINT division/addition —
  * deterministic under any evaluation order (integer sums commute), so
  * DuckDB replays the identical numbers by unrolling the same K steps.
  * The classic float formulation would be order-sensitive under
  * Spark's partial aggregation; the integer form is not.
  *
  * Scale: the Pregel shape — per iteration one (src-keyed) join of the
  * edge list against the rank relation and one dst-keyed partial-agg
  * shuffle, both on the SAME key space, so AQE reuses the exchange
  * layout; `localCheckpoint` truncates lineage each round (the d9b
  * star-contraction discipline) so K iterations cost K stages, not a
  * 2^K plan. K is fixed (dashboards want a bounded-cost centrality
  * score, not convergence detection — at 100 TB a convergence loop is
  * a driver-side barrier per test, and 3-10 fixed rounds is what
  * web-graph practice uses for candidate scoring).
  *
  * Mass is restricted to the nodes that appear in `pairs` (isolated
  * docs have no edges and no rank) — the centrality is OVER the dup
  * graph, not the corpus.
  */
object PageRank {

  /** @param pairs undirected edges as (d1, d2) — one row per pair,
    *              d1 < d2 by the dedup-pair convention (not required)
    * @return (doc_id, deg, pr_e9) after `iters` steps from a uniform
    *         1.0 (= 1e9) start
    */
  def pagerank(pairs: DataFrame, iters: Int = 3): DataFrame = {
    val edges = pairs.select(col("d1").as("src"), col("d2").as("dst"))
      .union(pairs.select(col("d2").as("src"), col("d1").as("dst")))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    var r = deg.select(col("src").as("doc_id"), col("deg"),
      lit(1000000000L).as("pr_e9"))
    for (_ <- 1 to iters) {
      val sums = edges
        .join(r, edges("src") === r("doc_id"))
        .select(col("dst"), expr("pr_e9 div deg").as("c"))
        .groupBy("dst").agg(sum("c").as("s"))
      r = deg.select(col("src").as("doc_id"), col("deg"))
        .join(sums.withColumnRenamed("dst", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"), col("deg"),
          (lit(150000000L) + expr("(85 * coalesce(s, 0L)) div 100"))
            .as("pr_e9"))
        .localCheckpoint()
    }
    r
  }

  /** Personalized PageRank: teleport mass restarts at the SEED SET
    * instead of uniformly — rank becomes proximity-to-the-seeds through
    * the graph, the "expand this contamination/boilerplate cluster"
    * query (d8 flags direct gram matches; PPR surfaces documents merely
    * CONNECTED to flagged ones, with rank decaying by graph distance).
    * Unnormalized form (each seed restarts with 0.15e9 per step, start
    * mass 1e9 on seeds, 0 elsewhere): relative ranking is unchanged and
    * every step stays the BIGINT arithmetic of `pagerank` — same
    * per-round plan, same oracle-unroll discipline; a non-seed node
    * with no seed-side path holds rank 0 forever (exactly the desired
    * "unreachable ⇒ unrelated" semantics).
    *
    * `seeds` is driver-held and bounded (the query batch contract) —
    * it inlines into the teleport CASE, no join.
    */
  def personalized(pairs: DataFrame, seeds: Seq[Long], iters: Int = 3): DataFrame = {
    val edges = pairs.select(col("d1").as("src"), col("d2").as("dst"))
      .union(pairs.select(col("d2").as("src"), col("d1").as("dst")))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    def isSeed = col("doc_id").isin(seeds: _*)
    var r = deg.select(col("src").as("doc_id"), col("deg"),
      when(isSeed, lit(1000000000L)).otherwise(lit(0L)).as("pr_e9"))
    for (_ <- 1 to iters) {
      val sums = edges
        .join(r, edges("src") === r("doc_id"))
        .select(col("dst"), expr("pr_e9 div deg").as("c"))
        .groupBy("dst").agg(sum("c").as("s"))
      r = deg.select(col("src").as("doc_id"), col("deg"))
        .join(sums.withColumnRenamed("dst", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"), col("deg"),
          (when(isSeed, lit(150000000L)).otherwise(lit(0L)) +
            expr("(85 * coalesce(s, 0L)) div 100")).as("pr_e9"))
        .localCheckpoint()
    }
    r.select(col("doc_id"), col("deg"), col("pr_e9"), isSeed.as("is_seed"))
  }
}
