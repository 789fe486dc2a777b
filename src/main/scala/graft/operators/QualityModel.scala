package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed-feature linear quality model — the fastText-style document
  * classifier every large corpus pipeline runs to score/filter
  * training text (quality, toxicity, domain), re-expressed as pure
  * Spark expressions so INFERENCE IS A QUERY: no model server, no UDF,
  * no driver round-trip — a broadcast of the weight table (or none at
  * all for in-expression weights) and one map-side-combined shuffle on
  * doc_id.
  *
  * The model: feature = hashing trick over tokens
  * (`pmod(md5-int(token), dims)` — the sp1 bucket idiom, engine-
  * portable), weight = INTEGER micro-units, logit = bias + Σ_tokens
  * w(bucket(token)). All-integer arithmetic: the per-doc sum is
  * order-independent under any partitioning, so results hash-match
  * cross-engine (the b3/t10 discipline) — where a float sigmoid would
  * be unhashable, the integer logit carries the same ranking and
  * thresholding information.
  *
  * Scale (100 TB): the token explode is narrow and map-local; the only
  * shuffle is the partial-aggregated per-doc sum (combiner collapses
  * each partition's contributions to one row per doc before the wire).
  * The weight-table form broadcasts `dims` rows — 2^20 dims is a few
  * MB, well inside broadcast range; weights ship once per executor,
  * exactly like serving a real exported model.
  */
object QualityModel {

  /** Feature bucket of a token: first 8 md5 hex digits as an integer,
    * mod dims (uniform; Spark `conv(x,16,10)` ≡ DuckDB
    * `CAST('0x'||substr(..) AS BIGINT)` — the sp1 mechanism).
    */
  def tokenBucket(token: Column, dims: Int): Column =
    pmod(conv(substring(md5(token), 1, 8), 16, 10).cast("long"), lit(dims.toLong))

  /** Deterministic pseudo-random weight for a bucket, integer
    * micro-units in [-1000, 1000] — the test-fixture model (a REAL
    * model would land as a (bucket, w) table: `scoreWithWeights`).
    * md5 of "w:<bucket>" keeps the weight stream independent of the
    * token-hash stream.
    */
  def bucketWeight(bucket: Column): Column =
    (conv(substring(md5(concat(lit("w:"), bucket.cast("string"))), 1, 8), 16, 10)
      .cast("long") % 2001L) - 1000L

  /** The in-expression weight table: (bucket, w) for every dim —
    * generated, not stored; used to materialize the broadcast form and
    * to prove the two paths identical (QualityModelSpec).
    */
  def derivedWeights(docs: DataFrame, dims: Int): DataFrame = {
    val spark = docs.sparkSession
    spark.range(dims.toLong).select(col("id").as("bucket"),
      bucketWeight(col("id")).as("w"))
  }

  /** Per-doc integer logit with IN-EXPRESSION weights: zero joins, zero
    * broadcasts — the whole model rides the expression tree. Docs with
    * no tokens score exactly `bias` (left join back to the full doc
    * set).
    */
  def scoreDerived(docs: DataFrame, idCol: String, textCol: String,
      dims: Int = 1024, bias: Long = 0L): DataFrame = {
    val tokens = docs.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("token"))
      .filter(col("token") =!= "")
    val summed = tokens
      .select(col("doc_id"), bucketWeight(tokenBucket(col("token"), dims)).as("w"))
      .groupBy("doc_id").agg(sum("w").as("w_sum"))
    docs.select(col(idCol).as("doc_id"))
      .join(summed, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (coalesce(col("w_sum"), lit(0L)) + lit(bias)).as("logit"))
  }

  /** Per-doc integer logit against a MATERIALIZED weight table
    * (bucket, w) — the shape a real exported model serves through:
    * weights broadcast once, tokens hash to buckets, equi-join, sum.
    * Buckets absent from the table contribute 0 (left join), so a
    * sparse model ships only its non-zero rows.
    */
  def scoreWithWeights(docs: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, dims: Int, bias: Long = 0L): DataFrame = {
    val tokens = docs.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("token"))
      .filter(col("token") =!= "")
    val summed = tokens
      .select(col("doc_id"), tokenBucket(col("token"), dims).as("bucket"))
      .join(broadcast(weights), Seq("bucket"), "left")
      .select(col("doc_id"), coalesce(col("w"), lit(0L)).as("w"))
      .groupBy("doc_id").agg(sum("w").as("w_sum"))
    docs.select(col(idCol).as("doc_id"))
      .join(summed, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (coalesce(col("w_sum"), lit(0L)) + lit(bias)).as("logit"))
  }

  /** Quality filter: docs whose logit clears `threshold` — the corpus-
    * filtering face (compose with sp-family quotas downstream).
    */
  def filterByScore(docs: DataFrame, idCol: String, textCol: String,
      threshold: Long, dims: Int = 1024, bias: Long = 0L): DataFrame =
    docs.join(
      scoreDerived(docs, idCol, textCol, dims, bias)
        .filter(col("logit") >= threshold)
        .select(col("doc_id").as(idCol)),
      Seq(idCol))
}
