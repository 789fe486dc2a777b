package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** Smoke + semantic checks for the SURVEY §2 query inventory. The strong
  * correctness gate is the driver's DuckDB oracle (tools/oracle_check.py
  * replicates it locally); these specs assert structural invariants fast.
  */
class QueriesSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  // Entries whose CORRECT result on this corpus is empty (the oracle
  // agrees on the empty set): d6 pins zero false positives — the
  // isotropic embeddings hold no pair above the 0.8 threshold.
  private val emptyByDesign = Set("d6_embedding_near_dups")

  test("all queries return rows at sf0.001 and have stable schemas") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      val n = df.count()
      if (!emptyByDesign(name)) assert(n > 0, s"$name returned no rows")
      assert(df.schema.fieldNames.nonEmpty, s"$name")
    }
  }

  test("u1: union is UNION DISTINCT (Snowflake semantics, SURVEY §7.4 #3)") {
    val df = SparkEntry.queries("u1_union_distinct")(spark, sf)
    assert(df.count() === df.distinct().count())
  }

  test("g2: non-publisher account sees only masked names") {
    val df = SparkEntry.queries("g2_secure_view_masked_rows")(spark, sf)
    import org.apache.spark.sql.functions.col
    val bad = df.filter(!col("customer_name").rlike("^REDACTED \\([0-9a-f]{32}\\)$"))
    assert(bad.count() === 0)
  }

  test("g1: publisher account sees unmasked and at-least-as-many rows") {
    import org.apache.spark.sql.functions.col
    val nycha = serve.GovernedView.orders(spark, sf, "ACCT_NYCHA")
    val pub = serve.GovernedView.orders(spark, sf, "ACCT_PUB")
    assert(pub.count() >= nycha.count())
    assert(pub.filter(col("customer_name").startsWith("REDACTED")).count() === 0)
  }

  test("p3: variant extraction is total — malformed JSON yields null, no throw") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq("""{"k": 3}""", "not json", null).toDF("props")
      .select(try_variant_get(try_parse_json(col("props")), "$.k", "int").as("k"))
    assert(df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0))).toSeq
      === Seq(Some(3), None, None))
  }
}
