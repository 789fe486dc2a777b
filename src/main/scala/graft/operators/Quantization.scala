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

  // ------------------------------------------------------------------
  // Scalar-quantile codebook quantization (the PQ/ADC storage tier):
  // a per-DIMENSION 16-level equal-frequency codebook (the product-
  // quantization table with deterministic rank-derived anchors instead
  // of k-means — anchors are exact data values picked by integer rank
  // arithmetic, so the whole build/encode/decode/search chain is
  // engine-exact and oracle-replayable, which float k-means can never
  // be). 4 bits/dim packed two-per-byte = 0.5 byte/dim — 8× over
  // float32, twice int8's ratio; asymmetric-distance search (ADC)
  // keeps the query side exact and scans only codes + the 256-row
  // codebook.
  // ------------------------------------------------------------------

  /** Codebook levels per dimension (4 bits). */
  val SqLevels = 16

  /** (dim, l, anchor): per-dimension equal-frequency anchors — anchor_l
    * is the component value at exact 0-based rank
    * ⌊(2l+1)·n / (2·levels)⌋ of that dimension's sorted values (the
    * median of the l-th equal-frequency bucket; t9's integer rank
    * arithmetic, no float quantile estimation). Building sorts each
    * dimension once (dim-keyed shuffle); a 100 TB deployment fits the
    * codebook on a bounded deterministic sample (the
    * IvfIndex.assign(maxTrainRows) contract) — the encode/decode
    * contract is unchanged.
    */
  def sqCodebook(emb: DataFrame, levels: Int = SqLevels,
      embCol: String = "embedding"): DataFrame = {
    val comps = emb.select(posexplode(col(embCol)).as(Seq("dim", "v")))
      .select(col("dim"), col("v").cast("double").as("v"))
    val ranked = comps.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("dim").orderBy("v")))
    val counts = comps.groupBy("dim").agg(count(lit(1)).as("n"))
    val targets = counts.crossJoin(
        emb.sparkSession.range(levels).selectExpr("CAST(id AS INT) AS l"))
      .selectExpr("dim", "l", s"((2 * l + 1) * n) div ${2 * levels} AS target")
    targets.join(ranked.withColumnRenamed("dim", "rdim"),
        col("rdim") === col("dim") && col("rn") - 1 === col("target"))
      .select(col("dim"), col("l"), col("v").as("anchor"))
  }

  /** (vec_id, codes): 4-bit codes packed two-per-byte into a tinyint
    * array (byte i = code[2i]·16 + code[2i+1] − 128, shifted into the
    * signed range). Encoding is a narrow pass: each component joins
    * the BROADCAST 16-anchor array of its dimension and left-folds an
    * argmin (strict `<`, so ties keep the LOWER level — both engines
    * agree bit-wise because every difference is an exact IEEE double
    * subtraction of float32-exact values).
    */
  def sqEncode(emb: DataFrame, codebook: DataFrame,
      levels: Int = SqLevels, idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val arr = codebook.groupBy("dim").agg(
      expr("transform(array_sort(collect_list(named_struct('l', l, 'a', anchor))), x -> x.a)")
        .as("anchors"))
    emb.select(col(idCol).as("vec_id"), posexplode(col(embCol)).as(Seq("dim", "v")))
      .join(broadcast(arr), "dim")
      .select(col("vec_id"), col("dim"),
        expr(s"""aggregate(sequence(0, ${levels - 1}),
          named_struct('d', CAST('Infinity' AS DOUBLE), 'l', -1),
          (acc, l) -> IF(abs(CAST(v AS DOUBLE) - element_at(anchors, l + 1)) < acc.d,
            named_struct('d', abs(CAST(v AS DOUBLE) - element_at(anchors, l + 1)), 'l', l),
            acc),
          acc -> acc.l)""").as("code"))
      .groupBy("vec_id")
      .agg(expr(
        "transform(array_sort(collect_list(named_struct('dim', dim, 'c', code))), x -> x.c)")
        .as("cs"))
      .select(col("vec_id"),
        expr(s"""transform(sequence(0, size(cs) div 2 - 1),
          i -> CAST(element_at(cs, CAST(2 * i + 1 AS INT)) * $levels
                    + element_at(cs, CAST(2 * i + 2 AS INT)) - 128 AS TINYINT))""")
          .as("codes"))
  }

  /** Codes back to a float32 `embedding` of anchors — the ADC corpus
    * side. Unpack is exact integer arithmetic ((b+128) div/mod 16);
    * reconstruction joins the broadcast codebook and reassembles in
    * dimension order.
    */
  def sqDecode(codes: DataFrame, codebook: DataFrame,
      levels: Int = SqLevels): DataFrame = {
    val unpacked = codes
      .select(col("vec_id"), posexplode(col("codes")).as(Seq("bi", "b")))
      .select(col("vec_id"),
        explode(expr(s"""array(
          named_struct('dim', bi * 2,     'code', (CAST(b AS INT) + 128) div $levels),
          named_struct('dim', bi * 2 + 1, 'code', (CAST(b AS INT) + 128) % $levels))"""))
          .as("u"))
      .select(col("vec_id"), col("u.dim").as("dim"), col("u.code").as("code"))
    unpacked.join(broadcast(codebook),
        unpacked("dim") === codebook("dim") && col("code") === col("l"))
      .select(col("vec_id"), unpacked("dim").as("d"),
        col("anchor").cast("float").as("a_f"))
      .groupBy("vec_id")
      .agg(expr(
        "transform(array_sort(collect_list(named_struct('d', d, 'a', a_f))), x -> x.a)")
        .as("embedding"))
  }

  /** Persist the SQ tier: `dir/codebook` (dims × levels rows) +
    * `dir/codes` (0.5 byte/dim per vector) — what a 100 TB corpus
    * actually keeps on disk for the ADC scan.
    */
  def saveSq(emb: DataFrame, dir: String, levels: Int = SqLevels): Unit = {
    val cb = sqCodebook(emb, levels).localCheckpoint()
    cb.coalesce(1).write.mode("overwrite").parquet(s"$dir/codebook")
    sqEncode(emb, cb, levels).write.mode("overwrite").parquet(s"$dir/codes")
  }

  /** The served corpus side: codes + codebook off disk, reconstructed
    * lazily in the scan (IvfIndex.load's quantized-store discipline).
    * Decoding is deterministic, so served search is bit-identical to
    * the ad-hoc n9 path.
    */
  def loadSq(spark: org.apache.spark.sql.SparkSession, dir: String,
      levels: Int = SqLevels): DataFrame =
    sqDecode(spark.read.parquet(s"$dir/codes"),
      spark.read.parquet(s"$dir/codebook"), levels)
}
