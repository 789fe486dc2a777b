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

  /** Inner equi-join with a salted key. Result is identical to
    * `left.join(right, key)` (asserted in SaltingSpec); only the
    * physical distribution changes.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0)
    // deterministic spread: salt derived from the whole left row, so
    // identical keys still scatter across all salt values
    val l = left.withColumn("_salt",
      pmod(xxhash64(struct(left.columns.map(col).toIndexedSeq: _*)), lit(salts)))
    val r = right
      .withColumn("_salt", explode(expr(s"sequence(0L, ${salts - 1}L)")))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }
}
