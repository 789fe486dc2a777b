package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — points matched to the intervals containing
  * them. A naive inequality join plans as BroadcastNestedLoopJoin
  * (O(n·m) compares); this composition bins the time axis so it becomes
  * an equi-join (SURVEY §7 preference (a); the same idea as engine
  * range-join optimizations):
  *
  *   bin = the longest interval length (so an interval spans ≤ 2 bins'
  *   worth of probes per point) → explode each interval to the bins it
  *   covers → equi-join points on their bin → re-check the exact range.
  *
  * Work is O(points + Σ interval-bins + true matches) with one hash
  * shuffle on the bin key — at 100 TB the bin key is uniformly spread
  * (time), so no skew. The bin width is computed from the interval
  * stats (one tiny aggregate), the standard practice.
  */
object RangeJoin {

  /** (interval_id, point_id) pairs where start ≤ point ts < end.
    * All comparisons in microseconds — the full precision the sources
    * carry — so results match an exact inequality-join oracle.
    *
    * `binHintUs` (0 = derive) overrides the bin width: correctness never
    * depends on it (intervals explode to every bin they cover; the exact
    * recheck filters), only the candidate volume does. The derived
    * default — the max interval length — caps replication at 2 bins per
    * interval, the safe choice when lengths are unknown. When point
    * density per bin is high (many points share a max-length bin), a
    * SMALLER bin trades bounded extra interval replicas (len/bin + 1)
    * for a proportionally smaller per-bin point×interval cross product —
    * the same knob engines expose as a range-join bin-size hint. Measured
    * at the 10× sf1-equivalent (PERF.md r10): max-len/8 saved ~18 % wall;
    * gains are bounded because enumerating the true matches (which grows
    * ~100× there) dominates whatever the candidate overhead is.
    *
    * The hint is CLAMPED to ≥ maxLen/4096: a hint far below the longest
    * interval would make that interval's `sequence()` enumerate
    * len/hint bins — millions of replicas per row, and past 2³¹
    * elements a hard SparkRuntimeException — which would break the
    * "correctness never depends on it" contract (review r10). 4096
    * bins per interval is far past the useful range of the trade.
    */
  def pointsInIntervals(
      points: DataFrame, pointId: String, pointTs: String,
      intervals: DataFrame, intervalId: String, startTs: String, endTs: String,
      binHintUs: Long = 0L): DataFrame = {
    val nonEmpty = intervals.filter(col(endTs) > col(startTs))
    // bin = max interval length in µs; driver-side scalar from a one-row
    // aggregate over interval metadata, not data volume.
    val maxLen = nonEmpty
      .agg(max(unix_micros(col(endTs)) - unix_micros(col(startTs)))).head
    if (maxLen.isNullAt(0))
      return points.sparkSession.emptyDataFrame
        .withColumn(intervalId, lit(null)).withColumn(pointId, lit(null))
        .limit(0)
    val binUs =
      if (binHintUs > 0L)
        math.max(binHintUs, math.max(1L, maxLen.getLong(0) / 4096L))
      else math.max(1L, maxLen.getLong(0))
    val p = points.select(col(pointId).as("_pid"),
      (unix_micros(col(pointTs)) / binUs).cast("long").as("_bin"),
      unix_micros(col(pointTs)).as("_pus"))
    val iv = nonEmpty.select(col(intervalId).as("_iid"),
      unix_micros(col(startTs)).as("_sus"), unix_micros(col(endTs)).as("_eus"))
      .withColumn("_bin", explode(expr(
        s"sequence(cast(_sus / $binUs as long), cast((_eus - 1) / $binUs as long))")))
    p.join(iv, Seq("_bin"))
      .filter(col("_pus") >= col("_sus") && col("_pus") < col("_eus"))
      .select(col("_iid").as(intervalId), col("_pid").as(pointId))
      .distinct()
  }
}
