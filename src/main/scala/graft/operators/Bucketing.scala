package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located joins — the shuffle-elimination tool for the
  * recurring big fact⋈fact join (SURVEY: "bucketing for co-located
  * joins"). Writing both sides bucketed (and sorted) by the join key
  * lets Spark plan a sort-merge join with ZERO shuffle exchanges: each
  * task reads bucket i of both tables. At 100 TB this turns the
  * dominant repeated lineitem⋈orders shuffle into a one-time layout
  * cost paid at ingest.
  *
  * (Bucket metadata lives in the catalog, so this path goes through
  * `saveAsTable` — plain parquet dirs carry no bucket spec.)
  */
object Bucketing {

  /** Persist `df` as a bucketed, per-bucket-sorted table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two equally-bucketed tables on their bucket key. With matching
    * bucket counts Spark plans SMJ over the co-located buckets — no
    * Exchange on either side (asserted in BucketingSpec).
    */
  def coLocatedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
