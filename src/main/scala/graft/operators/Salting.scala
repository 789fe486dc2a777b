package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-salting for skewed joins (SURVEY scale notes: "salting for
  * skew"). AQE's skew-join split handles most cases at runtime; this is
  * the explicit tool for when a single key dominates so heavily that
  * even split partitions overwhelm one executor, or when AQE is
  * unavailable (e.g. inside some streaming sinks).
  *
  * The skewed (fact) side gets a deterministic salt in [0, salts); the
  * other side is replicated once per salt value; the join key becomes
  * (key, salt), spreading each hot key over `salts` reducers. Cost: the
  * non-skewed side is materialized `salts` times — use where that side
  * is the smaller one (the usual case for skew).
  */
object Salting {

  /** The salt derivation every salted form (and SaltingSpec's
    * distribution assertions) shares: deterministic spread from the
    * WHOLE row of the salted side, so identical keys still scatter
    * across all salt values. Single definition — a change here changes
    * the operator and the spec's expectation together.
    */
  private[graft] def saltExpr(rowCols: Seq[org.apache.spark.sql.Column],
      salts: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(struct(rowCols.toIndexedSeq: _*)), lit(salts))

  /** Inner equi-join with a salted key. Result is identical to
    * `left.join(right, key)` (asserted in SaltingSpec); only the
    * physical distribution changes.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0)
    val l = left.withColumn("_salt", saltExpr(left.columns.map(col), salts))
    val r = right
      .withColumn("_salt", explode(expr(s"sequence(0L, ${salts - 1}L)")))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }

  /** Salted inner join on an arbitrary condition — the residual-
    * preserving form for joins that are MORE than an equi-join (e.g. an
    * interval join's range predicate). The salt equality joins the
    * condition's equi keys in the shuffle key, so Catalyst plans a
    * SortMergeJoin on (equiKeys..., salt) with the non-equi part as the
    * join residual — each hot key spreads over `salts` reducers and the
    * residual filters inside each, never after a cartesian. Result is
    * identical to `left.join(right, condition)` (SaltingSpec asserts
    * it). The two sides must not share column names (rename first —
    * the condition would be ambiguous anyway).
    */
  def saltedJoinOn(left: DataFrame, right: DataFrame,
      condition: org.apache.spark.sql.Column, salts: Int): DataFrame = {
    require(salts > 0)
    val l = left.withColumn("_lsalt", saltExpr(left.columns.map(col), salts))
    val r = right
      .withColumn("_rsalt", explode(expr(s"sequence(0L, ${salts - 1}L)")))
    l.join(r, condition && col("_lsalt") === col("_rsalt"))
      .drop("_lsalt", "_rsalt")
  }

  /** The left-side keys whose row count reaches `hotThreshold` — one
    * aggregation whose shuffle volume is DISTINCT KEYS (map-side partial
    * count), not rows. Bounded by construction: at most
    * n_left / hotThreshold keys qualify, so with a sane threshold the
    * result is a handful of rows, broadcastable.
    */
  private[graft] def hotKeys(df: DataFrame, key: String,
      hotThreshold: Long): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("_cnt"))
      .filter(col("_cnt") >= hotThreshold)
      .select(col(key).as("_hotk"))

  /** Sampled estimate of `hotKeys` — at 100 TB even the map-side-partial
    * count pass touches every row; a Bernoulli sample cuts it by 1/frac
    * while a REAL hot key (by definition a large constant fraction of
    * rows) still lands thousands of sampled rows. The threshold is
    * scaled by `frac`, with a binomial safety margin of 3σ so a key
    * sitting AT the true threshold is still found with near-certainty.
    * The margin deliberately trades FALSE POSITIVES for that recall
    * (r10 advice): when `hotThreshold*frac` is small — near the
    * `require` bound — the 3σ band is wide relative to the cutoff and
    * keys at a fraction of the true threshold pass with real
    * probability, inflating the broadcast hot set (each false positive
    * costs only some needless salting of a coldish key, never a wrong
    * row). Keep `hotThreshold*frac` comfortably large — ≥ ~100, i.e.
    * cutoff ≈ threshold·(1 − 0.3) — so the band stays tight and the
    * hot set stays a handful of genuinely hot keys. Seeded, so the
    * estimate is reproducible. Use for feeding `saltedJoinOnHotSet`;
    * when the decision boundary must be exact, pay for `hotKeys`.
    */
  private[graft] def hotKeysApprox(df: DataFrame, key: String,
      hotThreshold: Long, frac: Double, seed: Long = 42L): DataFrame = {
    require(frac > 0.0 && frac <= 1.0)
    val sampledThreshold = hotThreshold * frac
    val margin = 3.0 * math.sqrt(sampledThreshold)
    // a fraction too small for the margin silently degrades the filter
    // to "every sampled key is hot" — an unbounded set that would blow
    // up the broadcast it feeds; fail fast instead (review r10)
    require(sampledThreshold - margin >= 1.0,
      s"sample fraction $frac is too small for threshold $hotThreshold: " +
        s"need hotThreshold*frac - 3*sqrt(hotThreshold*frac) >= 1 " +
        s"(frac >= ~${16.0 / hotThreshold})")
    df.sample(withReplacement = false, frac, seed)
      .groupBy(col(key)).agg(count(lit(1)).as("_cnt"))
      .filter(col("_cnt") >= math.max(1.0, sampledThreshold - margin))
      .select(col(key).as("_hotk"))
  }

  /** Left side of the hot-only salted join: hot keys get the full salt
    * spread, cold keys a constant salt 0 — a broadcast hash join against
    * the bounded hot set, no shuffle.
    */
  private[graft] def saltLeftHot(left: DataFrame, leftKey: String,
      hot: DataFrame, salts: Int): DataFrame =
    left.join(broadcast(hot), col(leftKey) === col("_hotk"), "left")
      .withColumn("_lsalt",
        when(col("_hotk").isNotNull, saltExpr(left.columns.map(col), salts))
          .otherwise(lit(0L)))
      .drop("_hotk")

  /** Right side of the hot-only salted join: ONLY rows whose key is hot
    * are replicated `salts`×; cold rows pass through once with salt 0.
    * This is the whole point of the two-phase form — SaltingSpec counts
    * these rows to pin the no-cold-replication contract.
    */
  private[graft] def replicateRightHot(right: DataFrame, rightKey: String,
      hot: DataFrame, salts: Int): DataFrame =
    right.join(broadcast(hot), col(rightKey) === col("_hotk"), "left")
      .withColumn("_rsalt", explode(
        when(col("_hotk").isNotNull, expr(s"sequence(0L, ${salts - 1}L)"))
          .otherwise(expr("array(0L)"))))
      .drop("_hotk")

  /** Hot-key-only salted join — the 100 TB refinement of `saltedJoinOn`,
    * which replicates the ENTIRE right side `salts`× to spread what is
    * usually a handful of hot keys (VERDICT r9 #2: e6 paid 8×
    * replication of every cold user to fix one). Two phases: (1) count
    * rows per `leftKey` — one aggregation whose shuffle is distinct keys
    * — and keep keys at or above `hotThreshold`; (2) salt ONLY those:
    * hot left rows scatter over `salts` reducers, hot right rows
    * replicate `salts`×, and the cold majority of BOTH sides flows
    * through exactly once with a constant salt. The hot set rides a
    * broadcast join into both sides (never an `isin` literal — the set's
    * size must not shape the plan). Result is row-identical to
    * `left.join(right, condition)`: hot pairs meet on their scattered
    * salt, cold pairs on salt 0, and the residual filters inside each
    * bucket (SaltingSpec asserts equality on 90 %-skewed data and counts
    * the replicated side). Same contract as `saltedJoinOn`: the sides
    * must not share column names, and `condition` must imply
    * leftKey = rightKey (the salt derivation assumes matching rows agree
    * on the key).
    */
  def saltedJoinOnHot(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String,
      condition: org.apache.spark.sql.Column, salts: Int,
      hotThreshold: Long): DataFrame = {
    require(hotThreshold > 0)
    // localCheckpoint: the hot set feeds BOTH sides' salt-assignment
    // broadcasts, and exchange reuse is not guaranteed across the two
    // subtrees (observed: two independent BroadcastExchanges, i.e. the
    // per-key count aggregation — a full pass over the fact side —
    // planned twice). Materializing the bounded result (≤ n/threshold
    // rows) runs that aggregation exactly once.
    saltedJoinOnHotSet(left, leftKey, right, rightKey,
      hotKeys(left, leftKey, hotThreshold).localCheckpoint(true), condition, salts)
  }

  /** `saltedJoinOnHot` with the hot set supplied by the CALLER — the
    * out-of-band shape: key skew moves far slower than data, so a
    * production deployment derives the hot set from yesterday's counts,
    * a control table, or AQE skew stats, and feeds it forward instead of
    * re-counting per query. This is also what makes hot-only salting
    * STREAMABLE: `hot` is a static (or slowly-refreshed) relation, so
    * both sides' salt assignment is a stream-static broadcast join and
    * the salted equi-join runs under the engine's stream-stream rules
    * (StreamingSpec proves parity on the skew fixture). `hot` must be a
    * single-column relation of key values, small enough to broadcast —
    * which a REAL hot set is by definition.
    */
  def saltedJoinOnHotSet(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String, hot: DataFrame,
      condition: org.apache.spark.sql.Column, salts: Int): DataFrame = {
    require(salts > 0)
    require(hot.columns.length == 1, "hot set must be a single key column")
    // distinct: a duplicated key in a caller-fed hot set would REPLICATE
    // every matching row through the left joins — a correctness break,
    // not a perf wart. The set is broadcast-sized, so dedup is free.
    val h = hot.select(col(hot.columns.head).as("_hotk")).distinct()
    saltLeftHot(left, leftKey, h, salts)
      .join(replicateRightHot(right, rightKey, h, salts),
        condition && col("_lsalt") === col("_rsalt"))
      .drop("_lsalt", "_rsalt")
  }
}
