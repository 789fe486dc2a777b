package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints — Schleimer, Wilkerson & Aiken 2003
  * (the MOSS local-selection algorithm, public): hash every token
  * k-gram, slide a w-hash window, and keep each window's RIGHTMOST
  * MINIMUM hash. The selected (position, hash) set is the fingerprint.
  * Guarantees (the paper's): any shared token run of length ≥ w + k − 1
  * between two documents shares at least one selected hash, and the
  * expected fingerprint density is 2/(w + 1) of all grams — t4's
  * single global-min fingerprint detects only whole-doc equality;
  * winnowing localizes overlap.
  *
  * The whole selection is PER-DOCUMENT array arithmetic (builtin
  * higher-order functions — no shuffle, no UDF): grams → md5 hashes →
  * rightmost-argmin per window end via a last-write-wins `aggregate`
  * fold → `array_distinct`. Cost is n·w² integer ops per doc with w a
  * small constant; the downstream overlap join is a d2-shape inverted
  * index over the SELECTED hashes only, i.e. ~2/(w+1) the index size
  * the unwinnowed gram join (d8) pays — that density factor is the
  * operator's 100 TB argument.
  *
  * Docs with fewer than w grams winnow their single short window
  * (rightmost min of all grams); docs with no k-gram emit nothing.
  */
object Winnowing {

  /** (doc_id, pos, fp_hash): the selected fingerprints. `pos` is the
    * 0-based gram index — positional, so overlap reports can localize
    * the match inside each document.
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 4, w: Int = 4): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        expr(s"filter(split($textCol, ' '), x -> x != '')").as("ts"))
      .withColumn("hs", expr(
        s"""transform(
              IF(size(ts) >= $k, sequence(0, size(ts) - $k), array()),
              i -> CAST(conv(substring(md5(array_join(slice(ts, i + 1, $k), ' ')), 1, 8), 16, 10) AS BIGINT))"""))
      // MATERIALIZATION BARRIER — load-bearing: without it,
      // CollapseProject inlines the md5-transform expression above into
      // every `hs[...]` reference inside the selection lambdas, and the
      // interpreter then re-hashes the WHOLE gram array per element
      // access — O(n²·w²) md5 calls per document (measured: sf0.1
      // went from a hang to sub-second). The exchange materializes
      // `hs` once per row; one narrow doc-keyed shuffle is the price.
      .repartition(col("doc_id"))
      .withColumn("sel", expr(
        // window ends: one short window when 1 <= |hs| < w
        s"""array_distinct(transform(
              IF(size(hs) = 0, array(),
                 IF(size(hs) < $w, array(size(hs) - 1),
                    sequence($w - 1, size(hs) - 1))),
              e -> aggregate(
                sequence(greatest(e - $w + 1, 0), e), CAST(-1 AS INT),
                (acc, p) -> IF(hs[p] = array_min(slice(hs, greatest(e - $w + 1, 0) + 1, e - greatest(e - $w + 1, 0) + 1)),
                              CAST(p AS INT), acc))))"""))
      .select(col("doc_id"), explode(col("sel")).as("pos"),
        expr("element_at(hs, pos + 1)").as("fp_hash"))

  /** Overlap report over the winnowed index: document pairs sharing
    * selected hashes, with the shared-fingerprint count — the d2
    * inverted-index shape on a ~2/(w+1)-density index. By the paper's
    * guarantee, any pair sharing a ≥ (w + k − 1)-token run appears
    * here.
    */
  def overlaps(fps: DataFrame): DataFrame = {
    val a = fps.select(col("fp_hash"), col("doc_id").as("d1"))
    val b = fps.select(col("fp_hash"), col("doc_id").as("d2"))
    a.join(b, Seq("fp_hash"))
      .filter(col("d1") < col("d2"))
      .groupBy("d1", "d2")
      .agg(countDistinct("fp_hash").as("shared_fps"))
  }
}
