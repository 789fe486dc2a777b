package graft.queries

import graft.Tables
import graft.operators.SimilarityOps

/** Similarity search over the `embeddings` table (SURVEY extension ops;
  * builder brief "similarity search"). The exact brute-force and the
  * partitioned-heap implementations share one DuckDB oracle — the same
  * left-fold cosine written in DuckDB lambda SQL — proving the scale
  * path is exact, not approximate.
  */
object SimilarityQueries extends QueryPack {

  private val K = 10
  private val QueryIds: Seq[Long] = Seq(0L, 1L, 2L, 3L, 4L)

  /** DuckDB cosine with the identical fold order (list_reduce is a left
    * fold; double accumulation) — bit-identical to the Spark expression.
    */
  private def oracle: String = {
    def dot(a: String, b: String) =
      s"list_reduce(list_transform(list_zip($a, $b), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (acc, x) -> acc + x)"
    s"""WITH q AS (SELECT vec_id query_id, embedding qe FROM embeddings WHERE vec_id < 5),
       c AS (SELECT vec_id neighbor_id, embedding ne FROM embeddings),
       sims AS (SELECT query_id, neighbor_id,
         (${dot("qe", "ne")}) / (sqrt(${dot("qe", "qe")}) * sqrt(${dot("ne", "ne")})) AS sim
        FROM q, c WHERE neighbor_id <> query_id),
       ranked AS (SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk
        FROM sims)
       SELECT query_id, neighbor_id, CAST(rnk AS INTEGER) AS rnk, sim
       FROM ranked WHERE rnk <= $K ORDER BY query_id, rnk"""
  }

  val queries: Seq[Q] = Seq(

    // Exact top-k cosine, brute force (correctness baseline).
    Q("n1_knn_cosine",
      (s, d) => SimilarityOps
        .topKCosineWindow(Tables.load(s, d, "embeddings"), QueryIds, K)
        .orderBy("query_id", "rnk"),
      Some(oracle)),

    // Exact top-k cosine via per-partition bounded heaps — the 100 TB
    // plan (no corpus shuffle). Same oracle: exactness of the scale
    // path is part of the contract.
    Q("n2_knn_partitioned",
      (s, d) => SimilarityOps
        .topKCosinePartitioned(Tables.load(s, d, "embeddings"), QueryIds, K)
        .orderBy("query_id", "rnk"),
      Some(oracle)),

    // ANN: sign-LSH buckets + Hamming-1 multi-probe + exact re-rank.
    // Not SQL-expressible (hyperplane signatures) → rows-only here;
    // recall is verified on planted clusters in SimilaritySpec.
    Q("n3_ann_lsh",
      (s, d) => SimilarityOps
        .annSignLsh(Tables.load(s, d, "embeddings"), QueryIds, K)
        .orderBy("query_id", "rnk"),
      None),

    // ANN: IVF (k-means coarse quantizer, nprobe cells scanned, exact
    // re-rank). Training + banding not SQL-expressible → rows-only;
    // recall on planted clusters in SimilaritySpec.
    Q("n4_ann_ivf",
      (s, d) => graft.operators.IvfIndex
        .search(Tables.load(s, d, "embeddings"), QueryIds, K)
        .orderBy("query_id", "rnk"),
      None)
  )
}
