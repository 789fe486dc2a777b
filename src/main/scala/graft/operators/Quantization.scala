package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 embedding quantization — the storage lever for embedding-heavy
  * corpora: a float32 vector column is 4 bytes/dim; symmetric per-vector
  * int8 (one double scale + a tinyint array) is ~1 byte/dim, a ~4×
  * reduction on the dominant column of an embeddings table or a vector
  * index BEFORE parquet compression (QuantizationSpec measures the
  * on-disk ratio). The error contract is explicit: each component moves
  * by at most scale/2 = max|x|/254, so cosine neighborhoods survive
  * (spec: top-10 sets over the real embeddings table are near-identical
  * after a quantize→dequantize round trip).
  *
  * Everything is codegen'd array expressions — no UDF — and the
  * arithmetic is engine-exact: scale = list-max of |x| (double) / 127,
  * quantized value = floor(x/scale + 0.5) (explicit half-up — engines
  * disagree on round()'s half-to-even), dequantized = q · scale cast
  * back to float. n7_knn_quantized hash-matches the entire
  * quantize → dequantize → cosine top-k composition against DuckDB.
  */
object Quantization {

  private def absMax(embCol: String): Column =
    expr(s"array_max(transform($embCol, x -> abs(CAST(x AS DOUBLE))))")

  /** (vec_id, scale, qvec): symmetric per-vector int8. The 1e-30 floor
    * keeps an all-zero vector from dividing by zero (it quantizes to
    * zeros and dequantizes to zeros).
    */
  def quantize(emb: DataFrame, idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame =
    emb.select(col(idCol).as("vec_id"),
        greatest(absMax(embCol) / 127.0, lit(1e-30)).as("scale"),
        col(embCol).as("_e"))
      .select(col("vec_id"), col("scale"),
        expr("transform(_e, x -> CAST(floor(CAST(x AS DOUBLE) / scale + 0.5D) AS TINYINT))")
          .as("qvec"))

  /** The dequantized float vector as an expression over `scale`/`qvec`
    * columns — for callers (IvfIndex.load) that rebuild `embedding` in
    * place while keeping their other columns.
    */
  def dequantizeExpr: Column =
    expr("transform(qvec, v -> CAST(CAST(v AS DOUBLE) * scale AS FLOAT))")

  /** Back to a float32 `embedding` column (the shape every similarity
    * operator here consumes).
    */
  def dequantize(q: DataFrame): DataFrame =
    q.select(col("vec_id"), dequantizeExpr.as("embedding"))
}
