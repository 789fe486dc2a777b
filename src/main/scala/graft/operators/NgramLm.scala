package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bigram language-model scoring — the CCNet shape (Wenzek et al.
  * 2020, public: filter/partition a crawl by LM score trained on a
  * reference corpus) as a PURE QUERY: the "model" is a bigram count
  * table built inside the engine from the deterministic train split,
  * and inference is a join — the t12 discipline (no UDF, no model
  * server) applied to sequence modeling.
  *
  * Scoring is the FIXED-POINT ARITHMETIC-MEAN transition probability,
  * not log-perplexity: per bigram, p_e6 = ((c(w1,w2) + 1) · 1e6) div
  * (c(w1·) + V) — add-one smoothing over the train vocabulary V, where
  * c(w1·) is w1's bigram-prefix count — and a doc scores the integer
  * mean of its bigrams' p_e6. ln() is libm-private (the t6/b2
  * portability discipline), and unlike b3's few-distinct-idf case the
  * per-bigram value population here is too large for the guarded-floor
  * projection — so the surrogate stays log-free: it is monotone in
  * each transition probability and orders "predictable" text above
  * improbable token soup exactly as the perplexity filter does (the
  * spec pins the ordering on planted docs). Every number is integer
  * arithmetic, replayable bit-for-bit in a second engine.
  *
  * Scale: the model is two count tables keyed by (w1, w2) and (w1) —
  * fixed by vocabulary, not corpus; scoring is one explode + one
  * (w1, w2)-keyed join + a doc-keyed partial agg. Hot-prefix skew
  * (stopword bigrams) rides the same salting family as every other
  * hot-key join (operators/Salting.scala); a small vocabulary makes
  * the count tables broadcast-able.
  */
object NgramLm {

  /** The shared deterministic split bucket (sp1/d8 idiom). */
  private def splitBucket(idCol: Column): Column =
    conv(substring(md5(idCol.cast("string")), 1, 8), 16, 10)
      .cast("bigint") % 100

  /** (doc_id, w1, w2) bigrams over the empty-filtered token sequence
    * (the shared tokenization convention).
    */
  def bigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        expr(s"filter(split($textCol, ' '), x -> x != '')").as("ts"))
      // zip the sequence with its own shift — degrades to the empty
      // array for < 2 tokens (a sequence(0, size-2) form would emit a
      // DESCENDING index range there and trip ANSI array bounds)
      .select(col("doc_id"), expr(
        "explode(zip_with(slice(ts, 1, greatest(size(ts) - 1, 0)), " +
          "slice(ts, 2, greatest(size(ts) - 1, 0)), " +
          "(x, y) -> struct(x AS w1, y AS w2)))")
        .as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))

  /** The trained "model": bigram counts `cb`, prefix counts `cu`
    * (= Σ_w2 cb, derived so the two can never disagree), and the train
    * vocabulary size `V` — all from the deterministic train split
    * (split bucket < trainPct).
    */
  def trainCounts(docs: DataFrame, idCol: String, textCol: String,
      trainPct: Int = 80): (DataFrame, DataFrame, Long) = {
    val train = docs.filter(splitBucket(col(idCol)) < trainPct)
    val cb = bigrams(train, idCol, textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val cu = cb.groupBy("w1").agg(sum("cb").as("cu"))
    val v = train
      .select(explode(expr(s"filter(split($textCol, ' '), x -> x != '')")).as("tok"))
      .agg(countDistinct("tok")).collect().head.getLong(0)
    (cb, cu, v)
  }

  /** Score EVERY doc against the model: (doc_id, n_bigrams, n_oov,
    * mean_p_e6). Unseen bigrams smooth to ((0 + 1) · 1e6) div (cu + V)
    * via the same formula (cb = 0, and cu = 0 for an unseen prefix);
    * docs with < 2 tokens carry n_bigrams = 0 and mean_p_e6 = −1.
    */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String,
      cb: DataFrame, cu: DataFrame, v: Long): DataFrame = {
    val scored = bigrams(docs, idCol, textCol)
      .join(cb, Seq("w1", "w2"), "left")
      .join(cu, Seq("w1"), "left")
      .select(col("doc_id"),
        expr("((coalesce(cb, CAST(0 AS BIGINT)) + 1) * 1000000) div " +
          s"(coalesce(cu, CAST(0 AS BIGINT)) + CAST($v AS BIGINT))").as("p_e6"),
        when(col("cb").isNull, 1).otherwise(0).as("oov"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_bigrams"),
        sum("oov").cast("int").as("n_oov"),
        expr("sum(p_e6) div count(1)").as("mean_p_e6"))
    docs.select(col(idCol).as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0)).as("n_bigrams"),
        coalesce(col("n_oov"), lit(0)).as("n_oov"),
        coalesce(col("mean_p_e6"), lit(-1L)).as("mean_p_e6"))
  }

  /** The one-call face: train on the split, score the whole corpus. */
  def lmScore(docs: DataFrame, idCol: String, textCol: String,
      trainPct: Int = 80): DataFrame = {
    val (cb, cu, v) = trainCounts(docs, idCol, textCol, trainPct)
    scoreDocs(docs, idCol, textCol, cb, cu, v)
  }
}
