package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search") over the embedding column — the
  * compression tier between the scalar quantizer (`Quantization`, one
  * codebook per DIMENSION) and the coarse IVF partitioner (`IvfIndex`,
  * one centroid per REGION): the vector is split into `m` contiguous
  * subspaces and each sub-vector is replaced by the id of its nearest
  * codeword from a per-subspace k-means codebook, so a dims-float
  * vector stores as `m` small ints (dims·4 bytes → m bytes at k ≤ 256)
  * and search never touches the original vectors at all.
  *
  * Everything rides the `KMeans` fixed-point discipline, so the WHOLE
  * pipeline — per-subspace Lloyd training included — is exact integer
  * arithmetic and bit-replayable in the DuckDB oracle:
  *
  *  - **fit**: `KMeans.fitQ` per subspace over `slice(qv, lo, sub)`;
  *    the corpus is quantized and checkpointed ONCE and each subspace
  *    fit scans the same cached slice (m · iters corpus scans, each
  *    with only a k-row partial-agg exchange — the distributed-fit
  *    contract of `KMeans`). Codebooks are driver-held:
  *    m · k · (dims/m) = dims·k longs total, broadcast-class state.
  *  - **encode**: one map-side projection computes ALL m argmins per
  *    row against inlined codeword literals (`array_min` over
  *    (dist2, code) structs per subspace) — no join, no shuffle; the
  *    plan is a single codegen'd stage, which `PqSpec` asserts.
  *  - **ADC top-k** (asymmetric distance): the query keeps its exact
  *    sub-vectors; per (query, subspace) a k-entry lookup table of
  *    integer squared L2 distances to every codeword is computed ON
  *    THE DRIVER (bounded: queries · m · k longs) and shipped as a
  *    literal — each corpus row then prices its approximate distance
  *    as m `element_at`s + adds, again map-side. The only exchange in
  *    the whole search is the final per-query top-k (rideable by the
  *    `SimilarityOps.topKCosinePartitioned` heap at scale).
  *
  * Overflow headroom (BIGINT, the `KMeans` bound per subspace): with
  * |x| ≤ 8 a subspace dist2 ≤ sub·(2·8·10⁶)² ≈ 4·10¹⁵ at sub = 16, so
  * the m-term ADC sum stays ≤ ~1.6·10¹⁶ — exact in both engines.
  *
  * Reference scope: the reference (cstanca1/snowflake_data_pipeline_demo)
  * has no vector search; this is the builder-brief "similarity search —
  * scale path" extension, the codes-only storage tier a 100 TB corpus
  * needs when even int8 vectors (n7) are too large to scan.
  */
object PqIndex {

  /** (dist2, code) struct for one codeword of one subspace, computed
    * against the slice — inlined literal, map-side.
    */
  private def codeStruct(cent: Array[Long], code: Int, lo: Int, sub: Int): Column = {
    val arr = cent.mkString("array(", "L, ", "L)")
    struct(
      expr(s"aggregate(zip_with(slice(qv, ${lo + 1}, $sub), $arr, " +
        "(a, b) -> (a - b) * (a - b)), cast(0 as bigint), (acc, x) -> acc + x)")
        .as("dist2"),
      lit(code).cast("int").as("code"))
  }

  /** Per-subspace codebooks: `books(i)(c)` = codeword `c` of subspace
    * `i` (a dims/m-long fixed-point vector). One quantize + checkpoint,
    * then m independent `KMeans.fitQ` runs over the slices.
    */
  def fit(emb: DataFrame, m: Int, k: Int, iters: Int,
      dims: Int = 64): Seq[Seq[Array[Long]]] =
    fitQuantized(KMeans.quantized(emb).localCheckpoint(), m, k, iters, dims)

  /** The same fit over an already-quantized `(vec_id, qv)` relation —
    * the entry point residual quantizers (`IvfPq`) use. The caller is
    * expected to have checkpointed the input (as `fit` does).
    */
  def fitQuantized(q: DataFrame, m: Int, k: Int, iters: Int,
      dims: Int, maxTrainRows: Long = 0L): Seq[Seq[Array[Long]]] = {
    require(dims % m == 0, s"dims=$dims not divisible into m=$m subspaces")
    val sub = dims / m
    (0 until m).map { i =>
      // maxTrainRows: every subspace trains on the SAME deterministic
      // md5-prefix sample (the bound is over vec_ids, and the slice
      // preserves them) — one sample definition shared with the coarse
      // fit, which is exactly what the oracle's single `fitsmp` CTE
      // replays (`subChainsSql(trainLimitExpr)`)
      KMeans.fitQ(
        q.select(col("vec_id"),
          expr(s"slice(qv, ${i * sub + 1}, $sub)").as("qv")),
        k, iters, sub, maxTrainRows = maxTrainRows)
    }
  }

  /** Map-side PQ encoding: (vec_id, c0..c{m-1}, err2) where `ci` is the
    * nearest codeword of subspace i (ties to the smaller code id, the
    * `KMeans` argmin convention) and `err2` is the total integer
    * squared reconstruction error — the quality face a curation
    * pipeline reads before trusting the codes. No join, no shuffle.
    */
  def encode(emb: DataFrame, books: Seq[Seq[Array[Long]]],
      dims: Int = 64): DataFrame =
    encodeQ(KMeans.quantized(emb), books, dims)

  /** `encode` over an already-quantized `(vec_id, qv, …)` relation;
    * `carry` names extra input columns to pass through unchanged
    * (`IvfPq` carries the coarse cell id alongside the codes).
    */
  def encodeQ(q: DataFrame, books: Seq[Seq[Array[Long]]],
      dims: Int, carry: Seq[String] = Nil): DataFrame = {
    val m = books.length
    val sub = dims / m
    val bests = books.zipWithIndex.map { case (book, i) =>
      array_min(array(book.zipWithIndex.map { case (c, j) =>
        codeStruct(c, j, i * sub, sub)
      }: _*)).as(s"best$i")
    }
    val carried = carry.map(col)
    q.select((col("vec_id") +: carried) ++ bests: _*)
      .select(
        (col("vec_id") +: carried) ++
          (0 until m).map(i => col(s"best$i.code").as(s"c$i")) :+
          (0 until m).map(i => col(s"best$i.dist2"))
            .reduce(_ + _).as("err2"): _*)
  }

  /** ADC top-k: approximate squared distance from codes alone.
    * `queries` are (query_id, qv) rows ALREADY quantized; they are
    * collected (bounded by the query batch — the documented
    * bounded-collect contract) and turned into per-(query, subspace)
    * distance tables inlined as literals, so the scan side never
    * touches a float vector. Excludes self-matches; ranks by
    * (approx dist2 asc, neighbor_id) per query.
    */
  def adcTopK(codes: DataFrame, queries: DataFrame,
      books: Seq[Seq[Array[Long]]], k: Int, dims: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = codes.sparkSession
    val m = books.length
    val sub = dims / m
    val qRows = queries.select("query_id", "qv").collect()
    // driver-side integer LUT: lut(query)(subspace)(code) = dist2
    val lutRows = qRows.map { r =>
      val qid = r.getLong(0)
      val qv = r.getSeq[Long](1).toArray
      val luts = books.zipWithIndex.map { case (book, i) =>
        book.map { cent =>
          var s = 0L
          var d = 0
          while (d < sub) {
            val diff = qv(i * sub + d) - cent(d); s += diff * diff; d += 1
          }
          s
        }.toSeq
      }
      org.apache.spark.sql.Row.fromSeq(qid +: luts)
    }
    val lutSchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("query_id",
        org.apache.spark.sql.types.LongType, nullable = false) +:
        (0 until m).map(i => org.apache.spark.sql.types.StructField(
          s"lut$i", org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType, containsNull = false),
          nullable = false)))
    val lutDf = spark.createDataFrame(
      java.util.Arrays.asList(lutRows: _*), lutSchema)
    val adist = (0 until m)
      .map(i => element_at(col(s"lut$i"), col(s"c$i") + 1))
      .reduce(_ + _)
    val w = Window.partitionBy("query_id")
      .orderBy(col("adist2"), col("neighbor_id"))
    codes.crossJoin(broadcast(lutDf))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        adist.as("adist2"))
      .withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= k)
      .orderBy("query_id", "rnk")
  }

  /** DataFrame-NATIVE ADC top-k — `adcTopK` with the LUT build moved
    * off the driver (the `IvfPq.searchDf` contract at the flat-PQ
    * tier): per query row, each subspace's k distance-table entries
    * are integer sums against the single nested-array codebook
    * literal, computed in-plan; the batch-bounded LUT frame broadcasts
    * into the same cross-join tail. Zero driver collect of query
    * vectors, plan size flat in batch size, values bit-identical to
    * `adcTopK` (PqSpec pins it).
    */
  def adcTopKDf(codes: DataFrame, queries: DataFrame,
      books: Seq[Seq[Array[Long]]], k: Int, dims: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = books.length
    val sub = dims / m
    val booksL = typedlit(books.map(_.map(_.toSeq)))
    val luts = (0 until m).map { i =>
      transform(element_at(booksL, i + 1), cw =>
        aggregate(zip_with(slice(col("qv"), i * sub + 1, sub), cw,
            (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x)).as(s"lut$i")
    }
    val lutDf = queries.select(col("query_id") +: luts: _*)
    val adist = (0 until m)
      .map(i => element_at(col(s"lut$i"), col(s"c$i") + 1))
      .reduce(_ + _)
    val w = Window.partitionBy("query_id")
      .orderBy(col("adist2"), col("neighbor_id"))
    codes.crossJoin(broadcast(lutDf))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        adist.as("adist2"))
      .withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= k)
      .orderBy("query_id", "rnk")
  }

  /** Persist codes + codebooks — the build-once-serve-many tier (the
    * n5/n10 contract: immutable dataset, rebuild on change). Codebooks
    * flatten to (subspace, code, d, v) rows: dims·k longs, trivially
    * small but kept columnar so `load` needs no driver JSON.
    */
  def save(emb: DataFrame, dir: String, m: Int, k: Int, iters: Int,
      dims: Int = 64): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    val books = fit(emb, m, k, iters, dims)
    encode(emb, books, dims)
      .write.mode("overwrite").parquet(s"$dir/codes")
    books.zipWithIndex.flatMap { case (book, i) =>
      book.zipWithIndex.flatMap { case (c, j) =>
        c.zipWithIndex.map { case (v, d) => (i, j, d, v) }
      }
    }.toDF("subspace", "code", "d", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/books")
  }

  /** Load the served tier: (codes, books) with books reassembled into
    * the driver-held shape `fit` returns.
    */
  def load(spark: SparkSession, dir: String,
      dims: Int = 64): (DataFrame, Seq[Seq[Array[Long]]]) = {
    val codes = spark.read.parquet(s"$dir/codes")
    val rows = spark.read.parquet(s"$dir/books")
      .collect() // bounded: dims·k longs by construction
    require(rows.nonEmpty, s"no codebooks at $dir/books — not a PQ store")
    val m = rows.map(_.getInt(0)).max + 1
    val k = rows.map(_.getInt(1)).max + 1
    val sub = dims / m
    val books = Array.fill(m, k)(new Array[Long](sub))
    rows.foreach { r =>
      books(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getLong(3)
    }
    (codes, books.map(_.toSeq.map(identity)).toSeq)
  }

  // ---------------------------------------------------------------- oracle

  /** Per-subspace replay chain: the shared quantization `q` and seeding
    * (same k vec_ids for every subspace — `fitQ` seeds on the same
    * (md5(vec_id), vec_id) order), then per subspace the `KMeans`
    * round-unroll over the renumbered dim slice, CTEs prefixed `s{i}_`.
    * Ends with per-subspace final assignments `s{i}_asgF`.
    */
  def chainSql(m: Int, k: Int, iters: Int, dims: Int): String = {
    val sub = dims / m
    s"""q AS MATERIALIZED (SELECT vec_id,
           list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
           FROM embeddings),
         seeds AS MATERIALIZED (SELECT vec_id,
           CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS INTEGER) AS cluster
           FROM q ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $k),
         ${subChainsSql(m, k, iters, dims, (lo, hi) =>
      s"""SELECT vec_id, d - $lo AS d, qv[d] AS v
             FROM q, (SELECT unnest(range(${lo + 1}, ${hi + 1})) AS d)""")}"""
  }

  /** The m per-subspace training chains alone, with the per-dim rows of
    * subspace [lo, hi) supplied by `evSql` — `chainSql` feeds it from
    * the raw quantized vectors; `IvfPq`'s oracle feeds it from the
    * RESIDUAL relation. `seedsRel` names an in-scope k-row seeding CTE
    * (vec_id, cluster) — it must have exactly THIS k's rows (`IvfPq`
    * supplies its own, since its coarse chain's `seeds` has nlist rows).
    */
  def subChainsSql(m: Int, k: Int, iters: Int, dims: Int,
      evSql: (Int, Int) => String, seedsRel: String = "seeds",
      trainLimitExpr: String = ""): String = {
    val sub = dims / m
    (0 until m).map { i =>
      val lo = i * sub
      val p = s"s${i}_"
      // `trainLimitExpr` (the `fitQ(maxTrainRows)` replay at the PQ
      // tier): the per-subspace Lloyd rounds scan only the caller's
      // shared `fitsmp` prefix — the SAME md5-ordered sample the
      // coarse fit trains on (one sample definition, every fit) —
      // while the final per-subspace assignment stays full-corpus.
      // The caller must have emitted `fitsmp` (KMeans.chainSql with
      // the same expression); empty = the unsampled chain, verbatim.
      val evFit = if (trainLimitExpr.nonEmpty) s"${p}evf" else s"${p}ev"
      val fitCte = if (trainLimitExpr.isEmpty) ""
        else s"""${p}evf AS MATERIALIZED (SELECT e.vec_id, e.d, e.v
             FROM ${p}ev e JOIN fitsmp USING (vec_id)),
           """
      val rounds = (1 to iters).map { t =>
        val pr = t - 1
        s"""${p}dist$t AS MATERIALIZED (SELECT e.vec_id, c.cluster,
               CAST(sum((e.v - c.c) * (e.v - c.c)) AS BIGINT) AS dist2
               FROM $evFit e JOIN ${p}ct$pr c USING (d) GROUP BY 1, 2),
             ${p}asg$t AS MATERIALIZED (SELECT vec_id, cluster FROM (
               SELECT vec_id, cluster,
                 row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cluster) AS rn
               FROM ${p}dist$t) WHERE rn = 1),
             ${p}ct$t AS MATERIALIZED (SELECT pc.cluster, pc.d,
               COALESCE(CAST(u.s AS BIGINT) // u.n, pc.c) AS c
               FROM ${p}ct$pr pc LEFT JOIN (
                 SELECT a.cluster, e.d, sum(e.v) AS s, CAST(count(*) AS BIGINT) AS n
                 FROM ${p}asg$t a JOIN $evFit e USING (vec_id) GROUP BY 1, 2) u
               ON u.cluster = pc.cluster AND u.d = pc.d)"""
      }.mkString(",\n           ")
      val f = iters + 1
      s"""${p}ev AS MATERIALIZED (${evSql(lo, lo + sub)}),
           $fitCte${p}ct0 AS MATERIALIZED (SELECT s.cluster, e.d, e.v AS c
             FROM $seedsRel s JOIN ${p}ev e USING (vec_id)),
           $rounds,
           ${p}dist$f AS MATERIALIZED (SELECT e.vec_id, c.cluster,
             CAST(sum((e.v - c.c) * (e.v - c.c)) AS BIGINT) AS dist2
             FROM ${p}ev e JOIN ${p}ct$iters c USING (d) GROUP BY 1, 2),
           ${p}asgF AS MATERIALIZED (SELECT vec_id, cluster, dist2 FROM (
             SELECT vec_id, cluster, dist2,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cluster) AS rn
             FROM ${p}dist$f) WHERE rn = 1)"""
    }.mkString(",\n         ")
  }

  /** DuckDB replay of `encode`. */
  def encodeOracleSql(m: Int, k: Int, iters: Int, dims: Int): String = {
    val joins = (1 until m)
      .map(i => s"JOIN s${i}_asgF a$i USING (vec_id)").mkString(" ")
    val cols = (0 until m)
      .map(i => s"CAST(a$i.cluster AS INTEGER) AS c$i").mkString(", ")
    val err = (0 until m).map(i => s"a$i.dist2").mkString(" + ")
    s"""WITH ${chainSql(m, k, iters, dims)}
       SELECT a0.vec_id, $cols, $err AS err2
       FROM s0_asgF a0 $joins ORDER BY a0.vec_id"""
  }

  /** DuckDB replay of `adcTopK` with queries = vec_id < `nq`: the LUT
    * is the per-subspace exact distance from the query's own slice to
    * every trained codeword, the approximate distance joins each
    * corpus row's code against it — arithmetic-for-arithmetic the
    * Spark plan (driver LUT = SQL sum over `s{i}_ev`, both exact).
    */
  def adcOracleSql(m: Int, k: Int, iters: Int, dims: Int,
      nq: Int, topK: Int): String = {
    val luts = (0 until m).map { i =>
      s"""lut$i AS MATERIALIZED (SELECT e.vec_id AS query_id, c.cluster,
           CAST(sum((e.v - c.c) * (e.v - c.c)) AS BIGINT) AS d2
           FROM s${i}_ev e JOIN s${i}_ct$iters c USING (d)
           WHERE e.vec_id < $nq GROUP BY 1, 2)"""
    }.mkString(",\n         ")
    val codeJoins = (1 until m)
      .map(i => s"JOIN s${i}_asgF a$i USING (vec_id)").mkString(" ")
    val lutJoins = (0 until m).map { i =>
      if (i == 0) "JOIN lut0 l0 ON l0.cluster = c.c0"
      else s"JOIN lut$i l$i ON l$i.cluster = c.c$i AND l$i.query_id = l0.query_id"
    }.mkString(" ")
    val codeCols = (0 until m).map(i => s"a$i.cluster AS c$i").mkString(", ")
    val dsum = (0 until m).map(i => s"l$i.d2").mkString(" + ")
    s"""WITH ${chainSql(m, k, iters, dims)},
         $luts,
         codes AS (SELECT a0.vec_id, $codeCols FROM s0_asgF a0 $codeJoins),
         approx AS (SELECT l0.query_id, c.vec_id AS neighbor_id,
             $dsum AS adist2
           FROM codes c $lutJoins
           WHERE c.vec_id <> l0.query_id),
         ranked AS (SELECT query_id, neighbor_id, adist2,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY adist2, neighbor_id) AS INTEGER) AS rnk
           FROM approx)
       SELECT query_id, neighbor_id, adist2, rnk
       FROM ranked WHERE rnk <= $topK ORDER BY query_id, rnk"""
  }
}
