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
  * Selection runs as WINDOW FUNCTIONS over exploded gram rows (one
  * doc-keyed shuffle, codegen'd): per window end, the rightmost
  * minimum is `max(struct(-hash, pos))` over a `ROWS w-1 PRECEDING`
  * frame — min hash under the negation, ties resolved to the larger
  * pos, exactly the paper's rule. An earlier array-lambda
  * implementation kept the per-doc hash array in a projection and
  * relied on an exchange as a materialization barrier; the barrier was
  * porous — the optimizer pushed the explode's inferred
  * `size(sel) > 0` filter (with the WHOLE selection expression
  * inlined, md5s re-evaluated per element access) below it, an
  * O(n²·w²) interpreted blowup that hung the sf0.1 bench. Window
  * functions cannot be inlined into a pushed predicate, so the shape
  * is structurally immune, and WindowExec is codegen-adjacent rather
  * than interpreted. The downstream overlap join is a d2-shape
  * inverted index over the SELECTED hashes only, i.e. ~2/(w+1) the
  * index size the unwinnowed gram join (d8) pays — that density
  * factor is the operator's 100 TB argument.
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
      k: Int = 4, w: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = docs
      .select(col(idCol).as("doc_id"),
        expr(s"filter(split($textCol, ' '), x -> x != '')").as("ts"))
      .select(col("doc_id"), posexplode(expr(
        s"""transform(
              IF(size(ts) >= $k, sequence(0, size(ts) - $k), array()),
              i -> CAST(conv(substring(md5(array_join(slice(ts, i + 1, $k), ' ')), 1, 8), 16, 10) AS BIGINT))"""))
        .as(Seq("pos", "h")))
    val frame = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(-(w - 1), 0)
    val whole = Window.partitionBy("doc_id")
    grams
      // rightmost min of the trailing w hashes: hashes are < 2^32, so
      // the negation cannot overflow and struct max = (min h, max pos)
      .withColumn("best",
        max(struct((-col("h")).as("nh"), col("pos"))).over(frame))
      .withColumn("n", count(lit(1)).over(whole))
      // window ends: every pos >= w-1, plus the single short window
      // (its frame clips to the whole doc at the partition start)
      .filter(col("pos") >= w - 1 ||
        (col("n") < w && col("pos") === col("n") - 1))
      .select(col("doc_id"), col("best.pos").as("pos"),
        (-col("best.nh")).as("fp_hash"))
      .distinct()
  }

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
