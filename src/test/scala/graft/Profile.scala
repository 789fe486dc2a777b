package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scratch profiling harness for the round-3 bench outliers (p1, g1).
  * Times plan variants to isolate the hot operator. Lives in the TEST
  * source tree so it never ships in the library jar — run with
  * `sbt "Test/runMain graft.Profile"`.
  */
object Profile {
  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  def time(name: String, reps: Int = 3)(df: => DataFrame): Unit = {
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[prof] $name%-40s ${times.map(t => f"$t%.2f").mkString(" ")}")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables.load(spark, sfDir, "lineitem")

    // warm JIT on the full p1/g1 plans once
    SparkEntry.queries("p1_projection")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    SparkEntry.queries("g1_secure_view_agg")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()

    println("=== p1 variants ===")
    time("p1 as-is") {
      SparkEntry.queries("p1_projection")(spark, sfDir)
    }
    time("p1 no sort") {
      li.select(col("l_orderkey"), col("l_linenumber"),
        (dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("revenue"))
    }
    time("p1 sort, double arith") {
      li.select(col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy("l_orderkey", "l_linenumber")
    }
    time("p1 sort-first then project") {
      li.orderBy("l_orderkey", "l_linenumber")
        .select(col("l_orderkey"), col("l_linenumber"),
          (dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("double").as("revenue"))
    }
    time("p1 plain sort 2 keys only") {
      li.select("l_orderkey", "l_linenumber").orderBy("l_orderkey", "l_linenumber")
    }

    println("=== g1 variants ===")
    time("g1 as-is") {
      SparkEntry.queries("g1_secure_view_agg")(spark, sfDir)
    }
    time("g1 no governed view, manual") {
      val o = Tables.load(spark, sfDir, "orders")
      val c = Tables.load(spark, sfDir, "customer")
      val n = Tables.load(spark, sfDir, "nation")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .filter(c("c_mktsegment").like("BUIL%"))
        .groupBy(c("c_mktsegment")).agg(count(lit(1)).as("n"))
    }
    time("g2 as-is") {
      SparkEntry.queries("g2_secure_view_masked_rows")(spark, sfDir)
    }
    spark.stop()
  }
}
