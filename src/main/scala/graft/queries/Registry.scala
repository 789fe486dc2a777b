package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named, oracle-checkable query.
  *
  * @param name   stable key used by the driver's correctness gate
  * @param run    Spark implementation; `sfDir` points at the parquet tables
  * @param oracle equivalent ANSI SQL for DuckDB over the same tables, or
  *               None for ops that SQL cannot express (the driver then
  *               records a weaker rows-only check)
  *
  * Determinism contract (required for the driver's hash compare):
  *   - every query ends in a total ORDER BY (unique tie-break column);
  *   - double-typed aggregates go through DECIMAL(18,2) arithmetic and a
  *     final CAST to DOUBLE in BOTH engines, so results are bit-identical
  *     (all numeric testdata columns are 2-decimal, verified);
  *   - column names are aliased identically on both sides.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryPack {
  def queries: Seq[Q]
}
