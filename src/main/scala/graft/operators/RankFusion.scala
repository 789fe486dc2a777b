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
    // ONE exchange for the whole fusion (r20, guide §2.4): the old
    // chain paid an exchange per input list (the per-list best-rank
    // dedup), another for the contribution sum, and a third for the
    // rank window — S + 2 serialized AQE stages over relations that
    // are only S·Q·k rows. Instead the lists union TAGGED, the
    // explicit repartition on the fusion keys establishes the ONE
    // partitioning that satisfies every downstream requirement
    // (HashPartitioning(keys) clusters (keys, doc_id) for the
    // aggregate AND keys for the window), and one aggregation computes
    // each list's BEST (minimum) rank as a conditional min — the same
    // at-most-one-rank-per-(key, doc, list) defense as the per-list
    // dedup (ADVICE r11), same values: rrf_e12 = Σ_lists
    // Scale DIV (k0 + min-rank), n_lists = lists that returned the doc
    // (RankFusionSpec pins the contract cases).
    val tagged = ranked.zipWithIndex
      .map { case (df, i) =>
        df.select(keys :+ col("doc_id") :+ col("rnk") :+
          lit(i).as("_sys"): _*) }
      .reduce(_.unionByName(_))
    val bestPerList = ranked.indices.map(i =>
      min(when(col("_sys") === i, col("rnk"))).as(s"_r$i"))
    val contribOf = ranked.indices.map(i =>
      when(col(s"_r$i").isNotNull,
          expr(s"CAST($Scale DIV (CAST($k0 AS BIGINT) + CAST(_r$i AS BIGINT)) AS BIGINT)"))
        .otherwise(lit(0L)))
    val nListsOf = ranked.indices.map(i =>
      when(col(s"_r$i").isNotNull, 1L).otherwise(0L))
    val scored = tagged.repartition(keys: _*)
      .groupBy(keys :+ col("doc_id"): _*)
      .agg(bestPerList.head, bestPerList.tail: _*)
      .select(keys ++ Seq(col("doc_id"),
        contribOf.reduce(_ + _).as("rrf_e12"),
        nListsOf.reduce(_ + _).as("n_lists")): _*)
    val w = Window.partitionBy(keys: _*)
      .orderBy(col("rrf_e12").desc, col("doc_id"))
    scored.withColumn("out_rnk", row_number().over(w))
      .filter(col("out_rnk") <= k)
      .select(keys ++ Seq(col("out_rnk").cast("int").as("rnk"),
        col("doc_id"), col("rrf_e12"), col("n_lists")): _*)
  }
}
