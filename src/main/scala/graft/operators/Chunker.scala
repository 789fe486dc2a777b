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
}
