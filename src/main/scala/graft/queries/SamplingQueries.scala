package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic sampling / split assignment — the data-mixing primitive
  * of a training pipeline: every document lands in train/val/test (or in
  * a p% sample) as a pure function of its id, so the split is stable
  * across runs, engines, and cluster sizes, needs no coordination or
  * state, and is reproducible from the raw data alone.
  *
  * Mechanism: bucket = first 8 hex digits of md5(id) as an integer,
  * mod 100 — uniform, engine-portable (Spark `conv(x, 16, 10)` ≡ DuckDB
  * `CAST('0x' || x AS BIGINT)`), and oracle-checkable bit-for-bit,
  * unlike Bernoulli `sample()` whose RNG is engine-private.
  *
  * Scale: a narrow per-row projection + optional small agg — no shuffle
  * for assignment, embarrassingly parallel at any corpus size.
  */
object SamplingQueries extends QueryPack {

  private val bucketExpr =
    (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("bigint") % 100).as("bucket")

  val queries: Seq[Q] = Seq(

    // 80/10/10 train/val/test assignment, stable per document.
    Q("sp1_split_assign",
      (s, d) => Tables.load(s, d, "documents")
        .select(col("doc_id"), bucketExpr)
        .withColumn("split",
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val")
            .otherwise("test"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket,
             CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80 THEN 'train'
                  WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90 THEN 'val'
                  ELSE 'test' END AS split
             FROM documents ORDER BY doc_id""")),

    // Deterministic 10% sample, stratified per source: the sample rate
    // holds within every stratum (counts checked per source), without
    // shuffling or materializing strata.
    Q("sp2_stratified_sample",
      (s, d) => Tables.load(s, d, "documents")
        .select(col("doc_id"), col("source"), bucketExpr)
        .filter(col("bucket") < 10)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_sampled"), min(col("doc_id")).as("first_doc"))
        .orderBy("source"),
      Some("""SELECT source, count(*) AS n_sampled, min(doc_id) AS first_doc
             FROM documents
             WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 10
             GROUP BY source ORDER BY source"""))
  )
}
