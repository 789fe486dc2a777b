package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Ddl

class DdlSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("S10 CTAS materializes a snapshot readable as a table") {
    val dir = Files.createTempDirectory("graft_ddl").toString
    val src = Tables.load(spark, sf, "nation")
    val made = Ddl.ctas(src.filter(col("n_regionkey") === 1), s"$dir/nations_r1")
    assert(made.count() === src.filter(col("n_regionkey") === 1).count())
    assert(made.schema === src.schema)
    // errorifexists: a second CTAS to the same name must fail
    intercept[Exception] {
      Ddl.ctas(src, s"$dir/nations_r1")
    }
  }

  test("S11 truncate keeps schema, drops rows, and is if-exists tolerant") {
    val dir = Files.createTempDirectory("graft_ddl").toString
    val src = Tables.load(spark, sf, "region")
    Ddl.ctas(src, s"$dir/region_copy")
    Ddl.truncate(spark, s"$dir/region_copy")
    val after = spark.read.parquet(s"$dir/region_copy")
    assert(after.count() === 0)
    assert(after.schema === src.schema)
    Ddl.truncate(spark, s"$dir/never_created") // no-op, must not throw
  }

  test("withWarehouseSize scopes shuffle parallelism and records the resize") {
    val key = "spark.sql.shuffle.partitions"
    val prior = spark.conf.get(key)
    val hist = Files.createTempDirectory("graft_wh").toString + "/task_history"
    val clock = new graft.pipeline.ManualClock(
      java.sql.Timestamp.valueOf("2020-01-10 12:00:00").getTime)

    val seen = Ddl.withWarehouseSize(spark, "large", Some(hist), clock) {
      spark.conf.get(key)
    }
    assert(seen === Ddl.warehouseSizes("large").toString)
    assert(spark.conf.get(key) === prior, "prior parallelism not restored")

    // restored even when the body throws (the paired resize-back)
    intercept[RuntimeException] {
      Ddl.withWarehouseSize(spark, "xlarge") { throw new RuntimeException("boom") }
    }
    assert(spark.conf.get(key) === prior)

    intercept[IllegalArgumentException] {
      Ddl.withWarehouseSize(spark, "gigantic") { () }
    }

    // the resize AND the paired resize-back are visible where the
    // reference's monitoring looks (two ALTERs, dp_demo.sql:111-113,145)
    val rows = spark.read.parquet(hist)
      .select("name", "state", "scheduled_time").collect()
      .sortBy(_.getString(0))
    assert(rows.length === 2)
    assert(rows(0).getString(0) === "alter_warehouse_size_large")
    assert(rows(0).getString(1) === "SUCCEEDED")
    assert(rows(0).getTimestamp(2) === clock.now())
    assert(rows(1).getString(0) === "alter_warehouse_size_restore")
    assert(rows(1).getString(1) === "SUCCEEDED")

    // a throwing body records FAILED — not a pre-declared SUCCEEDED
    val hist2 = Files.createTempDirectory("graft_wh").toString + "/task_history"
    intercept[RuntimeException] {
      Ddl.withWarehouseSize(spark, "xlarge", Some(hist2), clock) {
        throw new RuntimeException("boom")
      }
    }
    val rows2 = spark.read.parquet(hist2)
      .select("name", "state").collect().sortBy(_.getString(0))
    assert(rows2.length === 2)
    assert(rows2(0).getString(0) === "alter_warehouse_size_restore")
    assert(rows2(0).getString(1) === "SUCCEEDED")
    assert(rows2(1).getString(0) === "alter_warehouse_size_xlarge")
    assert(rows2(1).getString(1) === "FAILED")
  }

  test("withWarehouseSize: unwritable history path cannot mask the body's exception") {
    // a regular FILE where the history dir should go → the parquet
    // append throws; the body's original error must still surface, with
    // the monitoring failure attached as suppressed, not replacing it
    val blocker = Files.createTempFile("graft_wh_block", ".dat")
    val badHist = blocker.toString + "/task_history"
    val key = "spark.sql.shuffle.partitions"
    val prior = spark.conf.get(key)
    val surfaced = intercept[RuntimeException] {
      Ddl.withWarehouseSize(spark, "large", Some(badHist)) {
        throw new RuntimeException("the real failure")
      }
    }
    assert(surfaced.getMessage === "the real failure")
    assert(surfaced.getSuppressed.nonEmpty,
      "monitoring-write failure was lost entirely")

    // a SUCCEEDED body with a failing monitoring write still surfaces
    // the write error — nothing is being masked in that direction
    intercept[Throwable] {
      Ddl.withWarehouseSize(spark, "large", Some(badHist)) { 42 }
    }
    assert(spark.conf.get(key) === prior, "prior parallelism not restored")
  }

  test("current_time/current_timestamp parity via injectable clock") {
    val clock = new graft.pipeline.ManualClock(
      java.sql.Timestamp.valueOf("2020-01-10 12:34:56").getTime)
    assert(clock.currentTime() === "12:34:56")
    assert(clock.now() === java.sql.Timestamp.valueOf("2020-01-10 12:34:56"))
  }
}
