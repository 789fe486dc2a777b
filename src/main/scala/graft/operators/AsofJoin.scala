package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — an operator Spark lacks natively, composed from existing
  * ops (SURVEY §7 custom-operator preference (a)): enrich each left row
  * with the most recent right row at-or-before its timestamp, per key.
  *
  * Implementation: tag and union both sides, then one carry-forward
  * window (`last(_, ignoreNulls)` over rows-unbounded-preceding) with
  * right rows ordered BEFORE left rows at equal timestamps (inclusive
  * `>=` semantics, matching DuckDB's ASOF JOIN, which serves as the
  * oracle). ONE shuffle on the key — same cost as a regular join —
  * versus the windowed-subquery alternative that shuffles twice. No
  * state blowup: the window is a running last, evaluated streamingly
  * within each partition.
  *
  * `right` must be unique per (key, ts) — pre-aggregate duplicates, as
  * any as-of semantics requires (DuckDB picks an arbitrary one
  * otherwise).
  */
object AsofJoin {

  /** @param left      rows to enrich
    * @param right     reference timeline: (key, ts, value columns)
    * @param key       equi-join key column name (both sides)
    * @param tsCol     event-time column name (both sides)
    * @param valueCols right-side columns carried onto left rows (null
    *                  when no right row precedes the left row)
    */
  def apply(
      left: DataFrame, right: DataFrame,
      key: String, tsCol: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = valueCols.foldLeft(left.withColumn("_is_left", lit(1)))(
      (df, c) => df.withColumn(s"_r_$c", lit(null).cast(right.schema(c).dataType)))
      .withColumn("_r_ts", lit(null).cast(right.schema(tsCol).dataType))
    val r = leftCols.filterNot(c => c == key || c == tsCol)
      .foldLeft(right.withColumn("_is_left", lit(0)))(
        (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .withColumn("_r_ts", col(tsCol))
    val rAligned = valueCols.foldLeft(r)((df, c) => df.withColumnRenamed(c, s"_r_$c"))
      .select(l.columns.map(col).toIndexedSeq: _*)

    val w = Window.partitionBy(key)
      .orderBy(col(tsCol), col("_is_left"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = l.select(l.columns.map(col).toIndexedSeq: _*).union(rAligned)
      .withColumn("_asof_ts", last(col("_r_ts"), ignoreNulls = true).over(w))
    val withVals = valueCols.foldLeft(carried)((df, c) =>
      df.withColumn(s"asof_$c", last(col(s"_r_$c"), ignoreNulls = true).over(w)))
    withVals.filter(col("_is_left") === 1)
      .withColumn("asof_ts", col("_asof_ts"))
      .select((leftCols.map(col) ++ Seq(col("asof_ts")) ++
        valueCols.map(c => col(s"asof_$c"))).toIndexedSeq: _*)
  }
}
