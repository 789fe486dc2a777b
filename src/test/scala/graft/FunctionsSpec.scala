package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions
import graft.operators.SimilarityOps

class FunctionsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("graft_cosine (native codegen) is bit-identical to the lambda fold") {
    GraftFunctions.register(spark)
    val e = Tables.load(spark, sf, "embeddings")
    val q = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val pairs = e.select(col("vec_id").as("nid"), col("embedding").as("ne"))
      .crossJoin(broadcast(q))
      .select(col("qid"), col("nid"),
        SimilarityOps.cosineSqlExpr("qe", "ne").as("native"),
        SimilarityOps.cosineLambdaExpr("qe", "ne").as("lambda"))
    // bit-for-bit equality of the double results
    val rows = pairs.select("native", "lambda").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("graft_cosine null semantics: null input, null element, length mismatch") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(1.0f, 2.0f))),
      (None, Some(Array(1.0f, 2.0f))),
      (Some(Array(1.0f, 2.0f)), Some(Array(1.0f, 2.0f, 3.0f))))
      .toDF("a", "b")
    val out = df.select(expr("graft_cosine(a, b)").as("c")).collect()
    assert(!out(0).isNullAt(0) && math.abs(out(0).getDouble(0) - 1.0) < 1e-12)
    assert(out(1).isNullAt(0))
    assert(out(2).isNullAt(0))
  }

  test("iff and current_account are SQL-callable (Snowflake dialect parity)") {
    GraftFunctions.register(spark)
    spark.conf.set("graft.current_account", "ACCT_TEST")
    val r = spark.sql(
      "SELECT iff(1 < 2, 'yes', 'no') AS i, current_account() AS acct").head
    assert(r.getString(0) === "yes")
    assert(r.getString(1) === "ACCT_TEST")
    // folds to a literal: the optimized plan should contain no
    // current_account call
    val plan = spark.sql("SELECT current_account() AS a")
      .queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("current_account"), plan)
  }

  test("GraftExtensions registers the same functions via SparkSessionExtensions") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext) // must not throw
  }
}
