package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** THE sliding-window chunker — one definition shared by t7's chunk
  * inventory and `Bm25.passageTopK`, because the expression carries a
  * subtle portability rule that must not fork (review r12): the
  * chunk-count arithmetic is INTEGER-only (`div` / DuckDB `//`, never
  * a float ceil), and `greatest()` wraps the SUBTRACTION, not the
  * quotient — a short doc's negative numerator truncates toward zero
  * in Spark's `div` but floors in DuckDB's `//`; keeping the numerator
  * non-negative makes the two identical.
  *
  * Yields (doc_id, ts, chunk_idx): the token array plus one row per
  * window of `window` tokens every `stride` (a doc shorter than one
  * window still yields chunk 0). A narrow explode — no shuffle.
  * Callers slice `ts` at `chunk_idx * stride + 1` themselves (t7 keeps
  * raw tokens for the md5; passage scoring filters empties).
  */
object Chunker {

  def explodeChunks(docs: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("ts"))
      .select(col("doc_id"), col("ts"),
        explode(expr(
          s"sequence(0, (greatest(size(ts) - $window, 0) + ${stride - 1}) div $stride)"))
          .as("chunk_idx"))

  /** CONTENT-DEFINED chunking (the storage-dedup boundary rule —
    * Muthitacharoen et al.'s LBFS idea over tokens): a position ends a
    * chunk when the hash of its trailing `k`-gram is ≡ 0 mod
    * `avgTokens` — boundaries depend only on LOCAL content, so
    * inserting or deleting tokens re-cuts at most the surrounding
    * chunk and everything ≥ k tokens downstream re-aligns, where
    * fixed windows (d12) shift every later boundary. The CDC chunks
    * are what segment-level dedup should key on when documents get
    * edited between crawls.
    *
    * Output: (doc_id, chunk_idx, n_tokens, chunk_text). All window
    * functions over exploded token rows (the winnowing discipline —
    * no array-lambda folds for the optimizer to inline): one doc-keyed
    * shuffle, codegen'd evaluation, engine-portable md5 arithmetic.
    * Positions 1..k-1 have no trailing gram and never cut; the last
    * position always ends the final chunk.
    */
  def cdcChunks(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 4, avgTokens: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("ts"))
      .select(col("doc_id"), posexplode(col("ts")).as(Seq("p0", "tok")),
        col("ts"))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("tok"),
        // trailing k-gram hash at pos (positions < k: null, never cuts)
        when(col("p0") + 1 >= k,
          expr(s"pmod(CAST(conv(substring(md5(concat_ws(' ', slice(ts, p0 + 2 - $k, $k))), 1, 8), 16, 10) AS BIGINT), $avgTokens)"))
          .as("g"))
    val order = Window.partitionBy("doc_id").orderBy("pos")
    val before = order.rowsBetween(Window.unboundedPreceding, -1)
    toks
      .withColumn("bnd", when(col("g") === 0L, 1L).otherwise(0L))
      .withColumn("chunk_idx",
        coalesce(sum(col("bnd")).over(before), lit(0L)))
      .groupBy("doc_id", "chunk_idx")
      .agg(count(lit(1)).as("n_tokens"),
        array_join(expr(
          "transform(array_sort(collect_list(named_struct('p', pos, 't', tok))), x -> x.t)"),
          " ").as("chunk_text"))
  }
}
