package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.util.hashing.MurmurHash3

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Three tiers, all deterministic:
  *
  *  1. `topKCosineWindow` — brute-force exact top-k: corpus ⨯ broadcast
  *     queries, cosine as a codegen'd left-fold (`aggregate`/`zip_with`,
  *     no UDF), rank via window. Correctness baseline; the window
  *     shuffles |corpus|·|queries| rows on query_id, so it does NOT
  *     scale past small query sets.
  *  2. `topKCosinePartitioned` — the 100 TB path for exact top-k: each
  *     corpus partition keeps a bounded per-query heap (mapPartitions,
  *     no shuffle of the corpus), then only partitions·queries·k
  *     candidate rows shuffle for the final merge. Output is bit-
  *     identical to (1) — same fold order — and shares its oracle.
  *  3. `annSignLsh` — sub-linear candidates via random-hyperplane sign
  *     LSH (deterministic ±1 hyperplanes from MurmurHash3) with
  *     Hamming-1 multi-probe, exact cosine re-ranking within buckets.
  *     For when even one pass per query is too much; recall depends on
  *     how clustered the corpus is (verified on planted clusters in
  *     SimilaritySpec — the isotropic test embeddings admit no
  *     meaningful ANN recall by construction).
  *
  * The cosine fold is written identically in Scala (`foldDot`) and SQL
  * (`cosineSqlExpr`): left-to-right double accumulation — bit-identical
  * in any IEEE engine, which is what makes the oracle hash-compare
  * possible.
  */
object SimilarityOps {

  /** Cosine similarity via the builtin lambda route — strict left-fold
    * in double precision. Kept as the reference implementation the
    * native expression is asserted bit-equal against (FunctionsSpec).
    */
  def cosineLambdaExpr(a: String, b: String): Column = {
    def dot(x: String, y: String) =
      s"aggregate(zip_with($x, $y, (x, y) -> double(x) * double(y)), cast(0 as double), (acc, x) -> acc + x)"
    expr(s"(${dot(a, b)}) / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))")
  }

  /** Cosine similarity via the native codegen expression
    * (graft.functions.CosineSimilarity) — same fold order, one fused
    * loop, no per-row lambda allocation. `register` is idempotent.
    */
  def cosineSqlExpr(a: String, b: String): Column =
    expr(s"graft_cosine($a, $b)")

  /** Same fold, driver/executor-side. */
  private def foldDot(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }
  private def cosine(a: Array[Float], b: Array[Float]): Double =
    foldDot(a, b) / (math.sqrt(foldDot(a, a)) * math.sqrt(foldDot(b, b)))

  /** Tier 1: brute-force exact top-k (excluding self). */
  def topKCosineWindow(emb: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val q = emb.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
    val sims = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineSqlExpr("qe", "ne").as("sim"))
    sims
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "rnk", "sim")
  }

  /** Brute top-k of an explicit query frame against an explicit corpus
    * frame (the ADC shape: queries stay exact while the corpus is a
    * reconstruction). `queries` = (query_id, qe), `corpus` =
    * (vec_id, embedding); self-pairs excluded by id when `excludeSelf`
    * — pass false for EXTERNAL queries whose ids may collide with
    * corpus vec_ids (the searchPrunedVecs collision caveat).
    */
  def topKCosineAgainst(corpus: DataFrame, queries: DataFrame, k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
    c.crossJoin(broadcast(queries))
      .filter(if (excludeSelf) col("neighbor_id") =!= col("query_id")
        else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        cosineSqlExpr("qe", "ne").as("sim"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "rnk", "sim")
  }

  /** Tier 2: exact top-k with per-partition bounded heaps — no corpus
    * shuffle; only partitions·|queries|·k candidates reach the merge.
    */
  def topKCosinePartitioned(emb: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val queries = emb.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])].collect()
      .sortBy(_._1)
    val bq = spark.sparkContext.broadcast(queries)
    // worse = lower sim, then higher id; PriorityQueue dequeues the max
    // (= worst) so the heap keeps the best k.
    val worstFirst: Ordering[(Double, Long)] = (x, y) => {
      val c = java.lang.Double.compare(y._1, x._1)
      if (c != 0) c else java.lang.Long.compare(x._2, y._2)
    }
    val candidates = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val qs = bq.value
        val heaps = qs.map(_ => new scala.collection.mutable.PriorityQueue[(Double, Long)]()(worstFirst))
        it.foreach { case (nid, ne) =>
          var qi = 0
          while (qi < qs.length) {
            val (qid, qe) = qs(qi)
            if (nid != qid) {
              val s = cosine(qe, ne)
              val h = heaps(qi)
              if (h.size < k) h.enqueue((s, nid))
              else if (worstFirst.compare((s, nid), h.head) < 0) { h.dequeue(); h.enqueue((s, nid)) }
            }
            qi += 1
          }
        }
        qs.iterator.zipWithIndex.flatMap { case ((qid, _), qi) =>
          heaps(qi).iterator.map { case (s, nid) => (qid, nid, s) }
        }
      }
      .toDF("query_id", "neighbor_id", "sim")
    candidates
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "rnk", "sim")
  }

  /** Deterministic ±1 hyperplane component for (bit i, dim j). The
    * hyperplanes are plan-build-time CONSTANTS (inlined into the SQL
    * expression), which is what makes the sign-LSH path replayable by
    * an external oracle — exposed package-wide so the oracle generator
    * emits the identical coefficients.
    */
  private[graft] def sign(i: Int, j: Int): Int =
    if ((MurmurHash3.stringHash(s"$i:$j") & 1) == 0) 1 else -1

  /** Derive the LSH code width from the corpus size: enough bits that the
    * expected bucket holds ~`targetBucket` vectors. Within-bucket
    * candidate generation is quadratic in bucket size, so a FIXED width
    * degenerates as the corpus grows (2^8 = 256 buckets ⇒ millions of
    * rows per bucket at 10^9 vectors); `log2(n / target)` keeps the
    * bucket-join bounded at any scale. Capped at `maxBits` — beyond that,
    * per-bucket recall needs more probes, not more bits.
    */
  def deriveBits(n: Long, targetBucket: Long = 4096L,
      minBits: Int = 8, maxBits: Int = 24): Int = {
    val needed =
      math.ceil(math.log(math.max(1.0, n.toDouble / targetBucket)) / math.log(2.0)).toInt
    math.min(maxBits, math.max(minBits, needed))
  }

  /** `deriveBits`' discipline at the IVF tier (VERDICT r18 #1): derive
    * the coarse cell COUNT from the vector-store row count so the
    * expected cell holds ~`targetPop` vectors at any scale. A FIXED
    * nlist makes nprobe/nlist a constant FRACTION of the corpus — the
    * probed "pruned read" silently degenerates into a quarter-corpus
    * scan as data grows; holding cell population ~constant instead
    * keeps a fixed-nprobe probe set a constant ROW count, i.e. a
    * shrinking fraction. Integer-exact and engine-portable (the d11
    * plane-derivation idiom): nlist = the smallest power of two p with
    * targetPop·p ≥ n, clamped to [minNlist, maxNlist] — the DuckDB
    * twin is one `min(p) over range` CTE, so a scale-derived artifact
    * still replays under one oracle hash across SFs.
    */
  def deriveNlist(n: Long, targetPop: Long = 512L,
      minNlist: Int = 16, maxNlist: Int = 256): Int = {
    var p = 0
    while (p < 24 && (targetPop << p) < n) p += 1
    math.max(minNlist, math.min(maxNlist, 1 << p))
  }

  /** The DuckDB twin of `deriveNlist` as a scalar SQL expression over
    * `SELECT count(*) FROM <nRel>` — composed into a geometry CTE by
    * oracle builders so one static oracle string derives the same
    * nlist at every SF.
    */
  def deriveNlistSql(nRel: String, targetPop: Long = 512L,
      minNlist: Int = 16, maxNlist: Int = 256): String =
    s"""greatest($minNlist, least($maxNlist, 1 << coalesce((SELECT min(p)
       FROM (SELECT unnest(range(0, 25)) AS p)
       WHERE (CAST($targetPop AS BIGINT) << p) >= (SELECT count(*) FROM $nRel)), 24)))"""

  /** Sign-LSH bucket id (`bits`-bit code) as a SQL expression. */
  def lshBucketExpr(embCol: String, bits: Int, dim: Int): Column = {
    val bitExprs = (0 until bits).map { i =>
      val proj = (0 until dim)
        .map(j => s"(${sign(i, j)}) * double($embCol[$j])").mkString(" + ")
      s"(CASE WHEN ($proj) >= 0 THEN ${1L << i}L ELSE 0L END)"
    }
    expr(bitExprs.mkString(" + "))
  }

  /** Tier 3: ANN — bucket the corpus once, probe each query's bucket and
    * its Hamming-1 neighbors, re-rank candidates by exact cosine.
    * Scans ~ (1+bits)/2^bits of the corpus per query in expectation.
    * `bits = 0` (the default) derives the code width from the corpus
    * size (`deriveBits`), keeping buckets ~constant-sized at any scale.
    */
  def annSignLsh(
      emb: DataFrame, queryIds: Seq[Long], k: Int,
      bits: Int = 0, dim: Int = 64, knownN: Long = 0L): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    // `knownN` = catalog-statistics hint (parquet footer row count via
    // Tables.rowCount): sizing the code width then costs no count() job.
    val b = if (bits > 0) bits
      else deriveBits(if (knownN > 0) knownN else emb.count())
    val bucketed = emb.select(col("vec_id"), col("embedding"),
      lshBucketExpr("embedding", b, dim).as("bucket"))
    val probes = (0 until b).map(i => col("bucket").bitwiseXOR(lit(1L << i))) :+ col("bucket")
    val q = bucketed.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        explode(array(probes: _*)).as("bucket"))
    val c = bucketed
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"), col("bucket"))
    // No distinct needed: a query's probe values {bucket, bucket^bit_i}
    // are all distinct and each corpus vector has ONE bucket, so every
    // (query, neighbor) candidate matches at most one probe.
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineSqlExpr("qe", "ne").as("sim"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "rnk", "sim")
  }
}
