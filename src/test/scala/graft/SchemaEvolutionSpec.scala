package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Lakehouse storage behaviors a long-lived 100 TB table depends on:
  * additive schema evolution across parquet file generations, and
  * directory-partition pruning on an event-date layout (the companion
  * to LayoutSpec's row-group min/max pruning — this one skips whole
  * DIRECTORIES before any footer is read).
  */
class SchemaEvolutionSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("mergeSchema reads v1+v2 file generations as one table; v1 rows null the new column") {
    val dir = Files.createTempDirectory("graft_schema_evo").toString
    // generation 1: (doc_id, text)
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .write.mode("append").parquet(dir)
    // generation 2 adds a quality column — additive evolution, the
    // only kind a append-only corpus store performs
    Seq((3L, "gamma", 7L), (4L, "delta", 9L))
      .toDF("doc_id", "text", "quality")
      .write.mode("append").parquet(dir)
    val df = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(df.columns.toSet === Set("doc_id", "text", "quality"))
    val rows = df.orderBy("doc_id").collect()
    assert(rows.length === 4)
    assert(rows.take(2).forall(_.isNullAt(rows.head.fieldIndex("quality"))))
    assert(rows.drop(2).map(_.getAs[Long]("quality")).toSeq === Seq(7L, 9L))
    // the old columns stay queryable without the option too
    assert(spark.read.parquet(dir).select("doc_id").count() === 4)
  }

  test("a day-partitioned event table prunes whole directories on a date filter") {
    val dir = Files.createTempDirectory("graft_day_part").toString
    Tables.load(spark, "/root/testdata/sf0.001", "events")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .write.partitionBy("day").mode("overwrite").parquet(dir)
    val nDays = new java.io.File(dir).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("day="))
    assert(nDays > 5)
    val q = spark.read.parquet(dir).filter(col("day") === "2024-01-03")
    val plan = q.queryExecution.executedPlan.toString
    // the day predicate must land in PartitionFilters (directory
    // pruning), NOT PushedFilters (row-group pruning after listing)
    assert("PartitionFilters: \\[[^\\]]*day".r.findFirstIn(plan).isDefined,
      plan.take(1500))
    val expected = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .filter(date_format(col("ts"), "yyyy-MM-dd") === "2024-01-03").count()
    assert(q.count() === expected)
    assert(expected > 0)
  }
}
