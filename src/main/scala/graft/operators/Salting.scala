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
}
