package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (`TESTDATA.md`).
  *
  * Each table is a single parquet file under `sfDir`. At 100 TB these
  * would be directories of many files (possibly partitioned/bucketed);
  * nothing here assumes single-file layout — `spark.read.parquet` takes
  * files or directories alike, and every query goes through this one
  * entry point so a future bucketed/partitioned layout is a one-line
  * change.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // `events.ts` is physically TIMESTAMP(NANOS) parquet, which Spark's
    // reader rejects (Spark timestamps are micros). Read nanos as a raw
    // long and convert — truncation to micros, matching what the DuckDB
    // oracle gets from `CAST(ts AS TIMESTAMP)`.
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      // integer `div` — a double division would lose precision on 1.7e18-
      // scale nano values (doubles carry 53 bits).
      df.withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }

  /** Register all tables as temp views (idempotent) so queries can be
    * expressed over `spark.sql` with the same table names the DuckDB
    * oracle sees. Catalyst still prunes columns and pushes filters down
    * to the parquet scan through the view.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach { n =>
      load(spark, sfDir, n).createOrReplaceTempView(n)
    }
}
