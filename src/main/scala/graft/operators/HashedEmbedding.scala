package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature-hashed document embeddings — text → fixed-dim vector as a
  * PURE QUERY, the embedding analogue of `QualityModel`'s inference:
  * each token hashes to a bucket (the shared md5 idiom) and each
  * bucket carries a deterministic integer weight PER DIMENSION
  * (md5("e:<dim>:<bucket>")); a doc's vector is the per-dimension sum
  * over its tokens — the random-projection / hashing-trick doc
  * embedding (public folklore: feature hashing, Weinberger et al.
  * 2009), not a learned model, but EXACTLY the plumbing one: a learned
  * embedding table would replace `dimWeight` with a broadcast lookup
  * and nothing else changes.
  *
  * Exactness: components are integer sums (order-independent,
  * cross-engine); they fit floats exactly (|component| ≤ tokens·1000
  * ≪ 2^24), float products are exact doubles, and a dim-16 dot of
  * integer-valued terms stays < 2^53 — so even the downstream COSINE
  * over these vectors is exact integer arithmetic plus one
  * IEEE-deterministic sqrt and divide, replayable bit-for-bit in any
  * engine (the n1 oracle discipline, with none of n1's float-rounding
  * caveats).
  *
  * Scale: one token explode, `dim` parallel integer sums in ONE
  * doc-keyed partial-agg shuffle (a single groupBy computes all
  * dimensions), left join back for zero-token docs. The derived
  * vectors feed every n-family operator unchanged — brute/partitioned
  * kNN, sign-LSH, IVF build/serve — giving text → vector → ANN
  * entirely inside the engine.
  */
object HashedEmbedding {

  /** Integer micro-unit weight of (dimension d, bucket) in
    * [-1000, 1000] — namespaced "e:" so the stream is independent of
    * QualityModel's "w:" weights and the token-bucket hash.
    */
  def dimWeight(bucket: Column, d: Int): Column =
    (conv(substring(md5(concat(lit(s"e:$d:"), bucket.cast("string"))), 1, 8), 16, 10)
      .cast("long") % 2001L) - 1000L

  /** (doc_id, embedding array<float> of length `dim`); zero-token docs
    * embed to the zero vector.
    *
    * r20 note: a broadcast (bucket → w0..w15) weight-table join was
    * prototyped here (16k md5 evaluations instead of 16 per token
    * occurrence) and MEASURED SLOWER at sf0.1 (t13 0.88 → 1.0 s, d11
    * 2.5 → 2.75 s, +2 jobs): the md5/conv/substring chain is
    * whole-stage-codegen'd and cheap, while the extra broadcast
    * exchange and join added fixed overhead. Kept in-expression —
    * guide §1: measurements over theory.
    */
  def embed(docs: DataFrame, idCol: String, textCol: String,
      dims: Int = 1024, dim: Int = 16): DataFrame = {
    val buckets = docs
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("token"))
      .filter(col("token") =!= "")
      .select(col("doc_id"), QualityModel.tokenBucket(col("token"), dims).as("bucket"))
    val aggs = (0 until dim).map(d => sum(dimWeight(col("bucket"), d)).as(s"_v$d"))
    val sums = buckets.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    // The exactness contract REQUIRES |component| < 2^24 (float's exact-
    // integer range; bound is tokens·1000, crossed around ~17k tokens).
    // Enforced, not assumed (review r12): a longer doc FAILS LOUDLY here
    // instead of silently rounding in float while the DuckDB twin keeps
    // the exact double — chunk such docs first (t7), or widen the
    // component type along with every Array[Float] consumer.
    def guarded(v: org.apache.spark.sql.Column) =
      when(abs(v) >= lit(1L << 24),
        expr(s"raise_error('HashedEmbedding: component exceeds float-exact range (doc too long; chunk it first)')"))
        .otherwise(v).cast("float")
    val vec = array((0 until dim).map(d =>
      guarded(coalesce(col(s"_v$d"), lit(0L)))): _*)
    docs.select(col(idCol).as("doc_id"))
      .join(sums, Seq("doc_id"), "left")
      .select(col("doc_id"), vec.as("embedding"))
  }

  /** Squared L2 norm as an exact BIGINT — pins the whole vector in a
    * scalar (used by the oracle entry and to exclude zero vectors from
    * cosine search). Takes the column NAME (SQL-expression splice).
    */
  def norm2(embeddingCol: String): Column =
    expr(s"aggregate($embeddingCol, CAST(0 AS BIGINT), " +
      "(acc, x) -> acc + CAST(x AS BIGINT) * CAST(x AS BIGINT))")
}
