package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed corpus-preparation chain — quality filter → exact dedup
  * → deterministic split — as ONE declarative plan. Each stage exists
  * standalone (t12 / d1 / sp1); this operator is the shape a real
  * training-data pipeline runs them in, and composing them in one
  * DataFrame keeps Catalyst free to pipeline the stages: the quality
  * logit, the content hash, and the split bucket are all computed in
  * the same pass over the text, and only the survivors reach the later
  * joins.
  *
  * Stage semantics (each pinned by its standalone entry's oracle):
  *   1. quality: hashed-linear-model logit (QualityModel.scoreDerived),
  *      keep docs with logit ≥ threshold;
  *   2. exact dedup: one keeper per distinct md5(text) — the MIN doc_id
  *      among surviving docs (d1's keeper rule, applied AFTER the
  *      quality gate so a high-quality copy can't be evicted by a
  *      filtered-out twin);
  *   3. split: md5-bucket 80/10/10 train/val/test (sp1's assignment —
  *      keyed on doc_id, so dedup cannot bias the split).
  *
  * Scale: stage 1 is the token-explode partial-agg sum (one doc-keyed
  * shuffle), stage 2 one content-hash shuffle of the survivors, stage 3
  * a pure projection. Nothing quadratic, nothing driver-side; the
  * near-dup/decontamination passes (d2-d10, d8) slot between stages 2
  * and 3 when the corpus needs them — they share the same doc_id keys.
  */
object CorpusPipeline {

  /** Cleaned corpus: (doc_id, source, text, logit, n_tokens, split). */
  def clean(docs: DataFrame, dims: Int = 1024, threshold: Long = 0L,
      bias: Long = 0L): DataFrame = {
    val scored = QualityModel
      .scoreDerived(docs, "doc_id", "text", dims, bias)
      .filter(col("logit") >= threshold)
    val surviving = docs
      .select(col("doc_id"), col("source"), col("text"))
      .join(scored, Seq("doc_id"))
    val keepers = surviving
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    surviving.join(keepers, Seq("doc_id"))
      .withColumn("n_tokens",
        size(filter(split(col("text"), " "), t => t =!= "")).cast("long"))
      .withColumn("bucket", SplitAssign.bucket(col("doc_id")))
      .withColumn("split", SplitAssign.split(col("bucket")))
      .select("doc_id", "source", "text", "logit", "n_tokens", "split")
  }
}
