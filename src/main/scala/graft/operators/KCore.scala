package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core peeling over an undirected pair relation — the graph-
  * degeneracy lens on the duplication graph, next to PageRank (d15,
  * centrality) and the triangle census (d16, clique-ness): the k-core
  * is the maximal subgraph where every vertex keeps degree ≥ k, found
  * by repeatedly deleting under-degree vertices. Boilerplate/template
  * families survive the peel (they are dense); incidental pairwise
  * near-dups and chain-shaped clusters dissolve — which makes the core
  * a cheap, deterministic "this duplication is STRUCTURAL" flag a
  * curation pipeline can gate on before spending exact-verify budget.
  *
  * Fixed-iteration discipline (PageRank.scala's contract): `rounds`
  * peel passes are run unconditionally — no data-dependent convergence
  * test, so the DuckDB oracle replays the exact trajectory and the
  * result is deterministic even if un-converged (a round that peels
  * nothing is a no-op, so R ≥ the peel depth gives the true k-core;
  * KCoreSpec plants a case that needs multiple rounds and asserts the
  * fixed point).
  *
  * Scale shape: per round one degree aggregation (vertex-keyed partial
  * agg) and two LEFT-SEMI joins of the edge list against the ≥k
  * survivor set — everything shuffles on vertex ids only; state is the
  * (shrinking) edge list, `localCheckpoint`ed per round to cut lineage
  * (the PageRank pattern). Peel depth on real graphs is tiny (the
  * degeneracy ordering converges in O(log n) rounds on power-law
  * graphs); rounds is the documented knob.
  */
object KCore {

  /** Survivors of `rounds` peel passes at threshold `k` over the
    * undirected pairs (d1, d2): (doc_id, deg) with deg the degree
    * INSIDE the core.
    */
  def peel(pairs: DataFrame, k: Int, rounds: Int): DataFrame = {
    var ed = pairs
      .select(col("d1").as("src"), col("d2").as("dst"))
      .union(pairs.select(col("d2").as("src"), col("d1").as("dst")))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val keep = ed.groupBy("src").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("src").as("v"))
        .localCheckpoint()
      ed = ed
        .join(keep, ed("src") === keep("v"), "left_semi")
        .join(keep, ed("dst") === keep("v"), "left_semi")
        .localCheckpoint()
    }
    ed.groupBy(col("src").as("doc_id")).agg(count(lit(1)).as("deg"))
      .orderBy("doc_id")
  }

  /** DuckDB replay of `peel`: the same `rounds` peel passes unrolled,
    * given an in-scope `jp(d1, d2, …)` pair CTE.
    */
  def peelOracleSql(k: Int, rounds: Int): String = {
    val steps = (1 to rounds).map { r =>
      val p = r - 1
      s"""kp$r AS MATERIALIZED (SELECT src AS v
           FROM (SELECT src, count(*) AS deg FROM ed$p GROUP BY 1)
           WHERE deg >= $k),
         ed$r AS MATERIALIZED (SELECT e.src, e.dst FROM ed$p e
           JOIN kp$r a ON a.v = e.src JOIN kp$r b ON b.v = e.dst)"""
    }.mkString(",\n         ")
    s"""ed0 AS MATERIALIZED (SELECT d1 AS src, d2 AS dst FROM jp
           UNION ALL SELECT d2, d1 FROM jp),
         $steps
       SELECT src AS doc_id, count(*) AS deg
       FROM ed$rounds GROUP BY 1 ORDER BY doc_id"""
  }
}
