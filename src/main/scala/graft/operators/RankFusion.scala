package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (RRF, Cormack & Clarke SIGIR'09) — the
  * standard score-free combiner for HYBRID retrieval: each input is one
  * system's ranked answer (lexical BM25, dense ANN, a heuristic
  * recency sort, ...) for the same query set, and the fused score of a
  * doc is Σ_systems 1/(k0 + rank). Rank-only fusion needs no score
  * calibration across systems — exactly why it is the default way to
  * combine `Bm25.topK` with `IvfIndex` ANN results in a retrieval
  * pipeline.
  *
  * Exactness: each contribution is the INTEGER 1e12 DIV (k0 + rank) —
  * exact integer division, positive operands, so Spark's `DIV` and
  * DuckDB's `//` agree — and the per-doc sum is an order-independent
  * BIGINT sum, hashable under any partitioning (the b3/t10 discipline).
  * With k0 = 60 and ranks ≤ 1000 the quotients are distinct enough
  * that ties are broken only where true RRF scores tie too (then by
  * doc_id, pinned).
  *
  * Scale: inputs are already top-k lists — each system's output is
  * |queries|·k rows, so the union, the (query_id, doc_id) partial-agg
  * sum, and the per-query rank window all run on rows-already-bounded
  * relations; nothing here touches a corpus. The fusion of S systems
  * over Q queries shuffles S·Q·k rows once.
  */
object RankFusion {

  val Scale = 1000000000000L // 1e12: rrf_e12 = Σ floor(1e12/(k0+rnk))

  /** Fuse ranked lists, each with columns (keyCols..., doc_id, rnk),
    * into per-key top-k by RRF. Output: (keyCols..., rnk, doc_id,
    * rrf_e12, n_lists) where n_lists counts the systems that returned
    * the doc. `keyCols` defaults to the single-query-stream shape; a
    * multi-consumer serving tier keys by (account, query_id) — VERDICT
    * r19 #4's per-grant fusion — and every aggregation/window below
    * simply widens its key, so the fused lists of different accounts
    * never mix.
    */
  def rrf(ranked: Seq[DataFrame], k: Int, k0: Int = 60,
      keyCols: Seq[String] = Seq("query_id")): DataFrame = {
    require(ranked.nonEmpty, "rrf needs at least one ranked list")
    require(k0 >= 1, "k0 must be >= 1")
    require(keyCols.nonEmpty, "rrf needs at least one key column")
    val keys = keyCols.map(col)
    val unioned = ranked
      .map(_.select(keys :+ col("doc_id") :+ col("rnk"): _*)
        // each list contributes AT MOST ONE rank per (key, doc): a
        // contract-violating input (e.g. a caller unioning two runs into
        // one frame) would otherwise silently double-sum that doc and
        // inflate n_lists (ADVICE r11). Collapse deterministically to
        // the BEST (minimum) rank; a well-formed top-k list passes
        // through unchanged, and the relation is already k-bounded so
        // the partial agg is tiny.
        .groupBy(keys :+ col("doc_id"): _*)
        .agg(min("rnk").as("rnk")))
      .reduce(_.unionByName(_))
    val contrib = unioned.select(keys :+ col("doc_id") :+
      expr(s"CAST($Scale DIV (CAST($k0 AS BIGINT) + CAST(rnk AS BIGINT)) AS BIGINT)")
        .as("contrib_e12"): _*)
    val scored = contrib.groupBy(keys :+ col("doc_id"): _*)
      .agg(sum("contrib_e12").as("rrf_e12"), count(lit(1)).as("n_lists"))
    val w = Window.partitionBy(keys: _*)
      .orderBy(col("rrf_e12").desc, col("doc_id"))
    scored.withColumn("out_rnk", row_number().over(w))
      .filter(col("out_rnk") <= k)
      .select(keys ++ Seq(col("out_rnk").cast("int").as("rnk"),
        col("doc_id"), col("rrf_e12"), col("n_lists")): _*)
  }
}
