package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-shaped importance scoring (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling"): fit hashed-unigram bag
  * distributions over a TARGET slice and the RAW remainder, then score
  * every raw document by how much its tokens look like the target.
  *
  * The paper's per-bucket log-ratio log(p_t/p_r) is replaced by the
  * fixed-point LINEAR surrogate
  *
  *   w_e6[b] = ((cnt_t[b]+1)·1e6) div (tot_t+dims)
  *           − ((cnt_r[b]+1)·1e6) div (tot_r+dims)
  *
  * (add-1 smoothing on both sides; all operands positive before the
  * subtraction, so Spark `div` ≡ DuckDB `//` and the whole chain stays
  * exact-integer / cross-engine replayable — the t12/t15 discipline).
  * The surrogate prefers exactly the buckets the target distribution
  * over-represents; a doc's score is the sum of w_e6 over its token
  * occurrences (the length-biased sum form — the mean variant is one
  * division away at the call site).
  *
  * Scale: the weight table is FIXED-SIZE (dims rows) and broadcast;
  * the corpus pays one token→bucket map and one doc-keyed partial-agg
  * shuffle. Counting both slices in ONE pass (conditional sums keyed
  * by bucket) reads the token stream once, not twice. Headroom: with
  * e6 scaling the weight magnitudes are ≤ 1e6, so a doc needs > 9e12
  * tokens to overflow the BIGINT sum — not a real document.
  */
object Dsir {

  /** Per-bucket fixed-point weight table: (b, w_e6), one row per
    * feature bucket that occurs in the corpus (absent buckets would
    * carry the two smoothing baselines' difference, but no doc can
    * ever hit them — every scored token occurrence hashes to an
    * occurring bucket).
    */
  def weights(tokens: DataFrame, isTarget: Column, dims: Int): DataFrame = {
    val cnts = tokens.groupBy("b").agg(
      sum(when(isTarget, 1L).otherwise(0L)).as("ct"),
      sum(when(isTarget, 0L).otherwise(1L)).as("cr"))
    val tots = tokens.agg(
      sum(when(isTarget, 1L).otherwise(0L)).as("tt"),
      sum(when(isTarget, 0L).otherwise(1L)).as("tr"))
    cnts.crossJoin(broadcast(tots))
      .select(col("b"),
        (expr(s"((ct + 1) * 1000000) div (tt + $dims)") -
          expr(s"((cr + 1) * 1000000) div (tr + $dims)")).as("w_e6"))
  }

  /** Importance scores for every RAW doc with ≥ 1 token:
    * (doc_id, score_e6, n_toks). `targetSources` names the trusted
    * slice of `sourceCol`; docs in it are used to fit the target
    * distribution and are never scored.
    */
  def importanceScores(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, targetSources: Seq[String],
      dims: Int = 1024): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
        col(sourceCol).as("source"),
        explode(split(col(textCol), " ")).as("token"))
      .filter(col("token") =!= "")
      .select(col("doc_id"), col("source"),
        QualityModel.tokenBucket(col("token"), dims).as("b"))
    val isT = col("source").isin(targetSources: _*)
    val w = weights(toks, isT, dims)
    toks.filter(!isT)
      .join(broadcast(w), Seq("b"))
      .groupBy("doc_id")
      .agg(sum("w_e6").as("score_e6"),
        count(lit(1)).cast("int").as("n_toks"))
  }
}
