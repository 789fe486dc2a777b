package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Engine-portable HyperLogLog primitives, shared by the batch entry
  * (t10_distinct_sketch) and the streaming face
  * (`streaming/SketchStream`). Everything here is deterministic md5
  * register arithmetic — no engine-private sketch state — so the
  * registers AND the estimate hash-match the DuckDB oracle down to the
  * double (the Σ 2^-rho register sum is exact dyadic arithmetic,
  * order-independent across any partitioning; see the t10 entry
  * comment in queries/TextQueries.scala).
  *
  * The register fold is per-bucket MAX — idempotent and commutative —
  * which is what makes the sketch distributable and streamable:
  * inserting a gram twice is a no-op, so no distinct pass is needed
  * anywhere, merges need no coordination, and crash replays cannot
  * corrupt the state.
  */
object Sketches {

  /** Bucket-index bits; M = 2^B registers. The hash is 15 md5 hex
    * chars = 60 bits (16 would overflow signed BIGINT in both
    * engines), leaving 60 − B bits for rho.
    */
  private val B = 8

  /** Register count (2^B): rel. error σ ≈ 1.04/√M = 6.5% at 256. */
  val M: Int = 1 << B

  /** md5-derived (bucket, rho) per input gram: low `B` of 60 hash bits
    * pick the bucket, rho = 1 + leading zeros of the remaining 60 − B
    * (via length(trim(bin)) — integer/string ops, no log/pow).
    */
  def gramRegisters(grams: DataFrame): DataFrame =
    grams
      .selectExpr(
        "CAST(conv(substring(md5(shingle), 1, 15), 16, 10) AS BIGINT) AS h")
      .selectExpr(s"pmod(h, $M) AS bucket",
        s"${60 - B} - length(trim(LEADING '0' FROM bin(h div $M))) + 1 AS rho")

  /** Fold to the DENSE register table: all `M` buckets, untouched ones
    * at rho = 0 (contributing 2^0 to the register sum).
    */
  def registerTable(regs: DataFrame): DataFrame =
    regs.sparkSession.range(M).selectExpr("id AS bucket")
      .join(regs.groupBy("bucket").agg(max("rho").as("rho")),
        Seq("bucket"), "left")
      .selectExpr("bucket", "coalesce(rho, 0) AS rho")

  /** Raw HLL estimate from a dense register table — one row with
    * (m, sum_inv, empty_registers, hll_estimate). Raw regime only; the
    * small-range linear-counting correction needs ln() (not
    * bit-portable), which is why `empty_registers` is exposed.
    */
  def estimate(registers: DataFrame): DataFrame =
    registers
      .selectExpr(
        "sum(1e0 / shiftleft(CAST(1 AS BIGINT), rho)) AS sum_inv",
        "CAST(sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS BIGINT) AS empty_registers")
      .selectExpr(s"$M AS m", "sum_inv", "empty_registers",
        s"0.7213e0 / (1e0 + 1.079e0 / ${M}e0) * ${M * M}e0 / sum_inv AS hll_estimate")

  // ------------------------------------------------------------------
  // Count-min (t11's sketch as a reusable operator; t11 now CALLS
  // these, and SketchStreamSpec additionally pins the estimates, so
  // the arithmetic exists exactly once)
  // ------------------------------------------------------------------

  /** (tok) → (tok, r, idx): each token's depth cell coordinates — THE
    * cell-index arithmetic (`conv` ≡ DuckDB hex cast), shared by the
    * counter and estimate faces.
    */
  private def cmCells(toks: DataFrame, depth: Int, width: Int): DataFrame =
    toks
      .select(col("tok"), explode(expr(s"sequence(0, ${depth - 1})")).as("r"))
      .selectExpr("tok", "r",
        s"CAST(conv(substring(md5(concat(r, ':', tok)), 1, 8), 16, 10) AS BIGINT) % $width AS idx")

  /** Count-min counters over a token relation `toks(tok)`:
    * (r, idx, c) for r < depth rows of width cells. ADDITIVE, hence
    * mergeable: counters of two corpus slices (or two micro-batches)
    * combine by cell-wise sum — the property the streaming form builds
    * on. Fixed-size output (≤ depth·width rows) at any corpus size.
    */
  def cmCounters(toks: DataFrame, depth: Int = 4, width: Int = 1024): DataFrame =
    cmCells(toks, depth, width)
      .groupBy("r", "idx").agg(count(lit(1)).as("c"))

  /** Point estimates from (possibly merged) counters for a token
    * relation `queryToks(tok)`: min over the token's depth cells —
    * the one-sided guarantee (estimate ≥ true count) holds for any
    * cell-wise-summed merge of `cmCounters` outputs.
    */
  def cmEstimate(counters: DataFrame, queryToks: DataFrame,
      depth: Int = 4, width: Int = 1024): DataFrame =
    cmCells(queryToks, depth, width)
      .join(counters, Seq("r", "idx"), "left")
      .groupBy("tok")
      .agg(min(coalesce(col("c"), lit(0L))).as("cm_estimate"))

  // ------------------------------------------------------------------
  // Log2-histogram quantile sketch — the DDSketch shape (Masson,
  // Rim & Lee, VLDB 2019, public) with base-2 buckets: floor(log2 v)
  // indexes a fixed ≤64-bucket histogram, so the sketch is ADDITIVE
  // (mergeable by bucket-wise sum — the cmCounters property), fixed-
  // size at any corpus size, and the rank→bucket quantile answer has a
  // guaranteed ≤2× relative-error envelope [lo, hi]. Production
  // DDSketch uses log_{1+α} buckets for a tighter α envelope; base 2
  // keeps the index log-free (bit-length string arithmetic, the HLL
  // rho idiom) and therefore bit-replayable in a second engine. t9
  // holds the exact-rank face; this is its streamable, mergeable twin.
  // ------------------------------------------------------------------

  /** Bucket-wise counts of floor(log2 v) over `values(v)`; v ≤ 0 lands
    * in bucket −1. `length(bin(v)) − 1` ≡ floor(log2 v) for v ≥ 1 in
    * Spark and DuckDB alike (bin renders without leading zeros).
    */
  def logHistogram(values: DataFrame): DataFrame =
    values
      .selectExpr(
        "CASE WHEN v <= 0 THEN -1 ELSE CAST(length(bin(v)) - 1 AS INT) END AS bucket")
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /** Quantile envelopes from a (possibly merged) histogram: for each
    * rational q = q_num/q_den, the ceiling rank, the smallest bucket
    * whose cumulative count reaches it, and the value envelope
    * [lo, hi] = [2^b, 2^(b+1) − 1] guaranteed to contain the exact
    * q-quantile. All-integer arithmetic (ceil via (a + d − 1) div d) —
    * no float ranks. The rank window runs over the ≤64-row sketch,
    * never the corpus, so the single-partition sort is O(buckets).
    */
  def histQuantiles(hist: DataFrame, qs: Seq[(Int, Int)]): DataFrame = {
    val spark = hist.sparkSession
    import spark.implicits._
    val total = hist.agg(sum("cnt").as("n"))
    val ranks = qs.toDF("q_num", "q_den").crossJoin(total)
      .selectExpr("q_num", "q_den",
        "(q_num * n + q_den - 1) div q_den AS rank")
    val cum = hist
      .withColumn("cum",
        sum("cnt").over(org.apache.spark.sql.expressions.Window
          .orderBy("bucket")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    ranks.join(cum, col("cum") >= col("rank"))
      .groupBy("q_num", "q_den", "rank")
      .agg(min("bucket").as("bucket"))
      .selectExpr("q_num", "q_den", "rank", "bucket",
        "CASE WHEN bucket < 0 THEN 0 ELSE shiftleft(CAST(1 AS BIGINT), bucket) END AS lo",
        "CASE WHEN bucket < 0 THEN 0 ELSE shiftleft(CAST(1 AS BIGINT), bucket + 1) - 1 END AS hi")
  }

  /** Per-group log2 histogram over `values(keys..., v)` — ≤64 buckets
    * PER KEY, still one partial-agg shuffle.
    */
  def logHistogramBy(values: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "use logHistogram for the global sketch")
    values
      .withColumn("bucket",
        expr("CASE WHEN v <= 0 THEN -1 ELSE CAST(length(bin(v)) - 1 AS INT) END"))
      .groupBy((keys :+ "bucket").map(col): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Per-group quantile envelopes — `histQuantiles` with the rank
    * window partitioned by the keys: state stays ≤64 rows per key, so
    * the sort inside each window partition is O(buckets) no matter the
    * corpus (contrast t9's exact ranks, which sort every row of every
    * group).
    */
  def histQuantilesBy(hist: DataFrame, keys: Seq[String],
      qs: Seq[(Int, Int)]): DataFrame = {
    require(keys.nonEmpty, "use histQuantiles for the global sketch")
    val spark = hist.sparkSession
    import spark.implicits._
    val totals = hist.groupBy(keys.map(col): _*).agg(sum("cnt").as("n"))
    val ranks = totals.crossJoin(qs.toDF("q_num", "q_den"))
      .selectExpr(keys ++ Seq("q_num", "q_den",
        "(q_num * n + q_den - 1) div q_den AS rank"): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy("bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = hist.withColumn("cum", sum("cnt").over(w))
    ranks.join(cum, keys).filter(col("cum") >= col("rank"))
      .groupBy((keys ++ Seq("q_num", "q_den", "rank")).map(col): _*)
      .agg(min("bucket").as("bucket"))
      .selectExpr(keys ++ Seq("q_num", "q_den", "rank", "bucket",
        "CASE WHEN bucket < 0 THEN 0 ELSE shiftleft(CAST(1 AS BIGINT), bucket) END AS lo",
        "CASE WHEN bucket < 0 THEN 0 ELSE shiftleft(CAST(1 AS BIGINT), bucket + 1) - 1 END AS hi"): _*)
  }

  // ------------------------------------------------------------------
  // Grouped HLL (t10's register arithmetic keyed by caller columns —
  // the per-source vocabulary face; K groups cost K·M rows of state,
  // still fixed-size at any corpus)
  // ------------------------------------------------------------------

  /** `gramRegisters` with caller key columns carried through: input
    * `(keys..., shingle)` → `(keys..., bucket, rho)`.
    */
  def gramRegistersBy(grams: DataFrame, keys: Seq[String]): DataFrame =
    grams
      .selectExpr(keys ++ Seq(
        "CAST(conv(substring(md5(shingle), 1, 15), 16, 10) AS BIGINT) AS h"): _*)
      .selectExpr(keys ++ Seq(s"pmod(h, $M) AS bucket",
        s"${60 - B} - length(trim(LEADING '0' FROM bin(h div $M))) + 1 AS rho"): _*)

  /** Dense per-group register table: every (group, bucket) cell present,
    * untouched cells at rho = 0 — the groups × M cross join is tiny
    * (groups are a small dimension by construction).
    */
  def registerTableBy(regs: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "use registerTable for the global sketch")
    regs.select(keys.map(col): _*).distinct()
      .crossJoin(regs.sparkSession.range(M).selectExpr("id AS bucket"))
      .join(regs.groupBy((keys :+ "bucket").map(col): _*)
          .agg(max("rho").as("rho")),
        keys :+ "bucket", "left")
      .selectExpr(keys ++ Seq("bucket", "coalesce(rho, 0) AS rho"): _*)
  }

  /** HLL SET ALGEBRA over per-group dense register tables: the pairwise
    * union sketch is the bucket-wise register MAX (the defining HLL
    * mergeability property — a union's registers equal the max of its
    * parts' registers, exactly), and the intersection is estimated by
    * inclusion–exclusion. Input: `registerTableBy(.., Seq(key))` rows
    * (key, bucket, rho); output one row per unordered pair (a < b) with
    * the three raw estimates, the inclusion–exclusion intersection, and
    * the derived Jaccard.
    *
    * This is the SKETCH path to cross-group overlap: groups² · M rows
    * total, never re-touching the corpus — against the exact gram join
    * (d14) that shuffles every shared shingle. σ ≈ 1.04/√M per estimate
    * (≈6.5% at M = 256); inclusion–exclusion compounds it, so small
    * true overlaps can estimate negative — reported raw (the caller
    * clamps), because clamping here would hide the variance the
    * estimator actually has.
    */
  def pairOverlap(registers: DataFrame, key: String): DataFrame = {
    val ra = registers.select(col(key).as("src_a"), col("bucket"),
      col("rho").as("rho_a"))
    val rb = registers.select(col(key).as("src_b"), col("bucket"),
      col("rho").as("rho_b"))
    val unions = ra.join(rb, Seq("bucket"))
      .filter(col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        greatest(col("rho_a"), col("rho_b")).as("rho"))
    val estU = estimateBy(unions, Seq("src_a", "src_b"))
      .selectExpr("src_a", "src_b", "hll_estimate AS est_union")
    val singles = estimateBy(registers, Seq(key))
      .selectExpr(s"$key AS k", "hll_estimate AS est")
    estU
      .join(singles.selectExpr("k AS src_a", "est AS est_a"), Seq("src_a"))
      .join(singles.selectExpr("k AS src_b", "est AS est_b"), Seq("src_b"))
      .selectExpr("src_a", "src_b", "est_a", "est_b", "est_union",
        "est_a + est_b - est_union AS est_inter",
        "(est_a + est_b - est_union) / est_union AS jaccard_est")
  }

  /** Per-group raw HLL estimate — `estimate` partitioned by the keys;
    * the register sum stays exact-dyadic per group, so the grouped
    * estimates hash cross-engine exactly like the global one.
    */
  def estimateBy(registers: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "use estimate for the global sketch")
    registers.groupBy(keys.map(col): _*)
      .agg(
        expr("sum(1e0 / shiftleft(CAST(1 AS BIGINT), rho))").as("sum_inv"),
        expr("CAST(sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS BIGINT)")
          .as("empty_registers"))
      .selectExpr(keys ++ Seq(s"$M AS m", "sum_inv", "empty_registers",
        s"0.7213e0 / (1e0 + 1.079e0 / ${M}e0) * ${M * M}e0 / sum_inv AS hll_estimate"): _*)
  }
}
