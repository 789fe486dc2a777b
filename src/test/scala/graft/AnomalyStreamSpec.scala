package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.AnomalyStream

/** Streaming anomaly detection (AnomalyStream) — the e11 twin on the
  * shared partial-partition machine: chopping-invariant, replay-safe,
  * and bit-identical to the batch entry over the delivered events.
  */
class AnomalyStreamSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private val evSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("event_type", StringType)))

  test("streamed daily counts fold to e11's exact flags; replay never double-counts") {
    val ev = Tables.load(spark, sf, "events")
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("event_type"))
    val srcDir = Files.createTempDirectory("graft_anom_src").toString
    val base = Files.createTempDirectory("graft_anom").toString
    (0 until 3).foreach { i =>
      ev.filter(pmod(col("event_id"), lit(3)) === i).coalesce(1)
        .write.mode("overwrite").parquet(s"$srcDir/f$i")
      new java.io.File(s"$srcDir/f$i").listFiles()
        .foreach(f => f.setLastModified(1700000000000L + i * 60000L))
    }
    val src = spark.readStream.schema(evSchema)
      .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
      .parquet(s"$srcDir/*")
    val q = AnomalyStream.dailyCountStream(src, s"$base/out", s"$base/ck")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("event_type", "day", "c", "dev2", "thr", "is_anomaly")
      .collect()
      .map(r => (r.getString(0), r.getAs[java.time.LocalDateTime](1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5))).toSet

    val streamed = rows(AnomalyStream.flags(spark, s"$base/out"))
    val batch = rows(SparkEntry.queries("e11_count_anomalies")(spark, sf))
    assert(streamed === batch)
    assert(streamed.nonEmpty)

    // crash replay of wave 0's partial: dynamic overwrite of its own
    // partitions — the fold must be unchanged, not doubled
    ev.filter(pmod(col("event_id"), lit(3)) === 0)
      .groupBy(col("event_type").as("g"),
        expr("CAST(datediff(date_trunc('day', ts), DATE '1970-01-01') AS BIGINT)")
          .as("idx"))
      .agg(count(lit(1)).as("c"))
      .select(col("g"), lit(0).as("r"), col("idx"), col("c"))
      .withColumn("_batch_id", lit(0L))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("g", "_batch_id").parquet(s"$base/out")
    assert(rows(AnomalyStream.flags(spark, s"$base/out")) === batch,
      "replayed partial double-counted")
  }

  test("flags on a not-yet-written store is the empty report, not a crash") {
    val empty = Files.createTempDirectory("graft_anom_empty").toString + "/out"
    assert(AnomalyStream.flags(spark, empty).count() === 0)
  }
}
