package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bucketing

class BucketingSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("bucketed fact-fact join plans with zero shuffle exchanges") {
    val li = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val o = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderdate"))
    Bucketing.writeBucketed(li, "li_b", "l_orderkey", 8)
    Bucketing.writeBucketed(o, "o_b", "l_orderkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the join strategy a 100 TB fact-fact join would get
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.coLocatedJoin(spark, "li_b", "o_b", "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(2000))
      // and it computes the same result as the unbucketed join
      val expected = li.join(o, "l_orderkey").count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }

  test("bucketed layout removes the j1 fact-fact shuffle at sf0.1 " +
    "(real revenue aggregate, not a toy table)") {
    // The one-time layout a production pipeline would write at ingest:
    // both fact tables bucketed+sorted on the join key (32 buckets at
    // sf0.1; at 100 TB the same layout with more buckets). The j1-shaped
    // revenue aggregate then plans its lineitem⋈orders sort-merge join
    // with NO exchange on the join key — the only remaining shuffle is
    // the final group-by, which is unavoidable and tiny.
    val sf01 = "/root/testdata/sf0.1"
    val li = Tables.load(spark, sf01, "lineitem")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val o = Tables.load(spark, sf01, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"))
    Bucketing.writeBucketed(li, "li_b01", "l_orderkey", 32)
    Bucketing.writeBucketed(o, "o_b01", "l_orderkey", 32)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      def revenueAgg(left: org.apache.spark.sql.DataFrame,
          right: org.apache.spark.sql.DataFrame) =
        left.join(right, "l_orderkey")
          .groupBy(col("o_custkey") % 25)
          .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1) - col("l_discount").cast("decimal(18,2)"))).as("revenue"),
            count(lit(1)).as("n"))
      val bucketed = revenueAgg(spark.table("li_b01"), spark.table("o_b01"))
      val plan = bucketed.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey"),
        "join key still shuffles:\n" + plan.take(2000))
      // same answer as the unbucketed plan
      val expected = revenueAgg(li, o).collect().toSet
      assert(bucketed.collect().toSet === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_b01")
      spark.sql("DROP TABLE IF EXISTS o_b01")
    }
  }
}
