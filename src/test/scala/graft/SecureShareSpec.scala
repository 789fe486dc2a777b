package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline._
import graft.serve.SecureShare

/** End-to-end step-7 parity: pipeline → modelled tables → the verbatim
  * secure-view SQL → per-account governed consumption (dp_demo.sql
  * 222-291, with the reference's session-variable account switching).
  */
class SecureShareSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val pipe: Pipeline = {
    val root = Files.createTempDirectory("graft_share").toString
    val paths = PipelinePaths(root)
    Producer.streamData(spark, sf, paths.stage, "01/02/1995", "01/15/1995")
    val p = new Pipeline(spark, paths)
    p.runAvailableNow()
    p
  }

  test("secure view filters rows by account and masks for non-publishers") {
    SecureShare.registerTripsSecureView(spark, pipe)

    spark.conf.set("graft.current_account", "ACCT_NYCHA")
    val nycha = spark.table("trips_secure_vw")
    // row filter: only programs matching NYCHA's LIKE pattern
    assert(nycha.filter(!col("program_name").startsWith("NATION_1")).count() === 0)
    assert(nycha.count() > 0)
    // masking: station names are all REDACTED(md5)
    assert(nycha.filter(
      !col("start_station_name").rlike("^REDACTED \\([0-9a-f]{32}\\)$")).count() === 0)
    assert(nycha.select("acct").distinct().collect().map(_.getString(0)).toSeq
      === Seq("ACCT_NYCHA"))

    spark.conf.set("graft.current_account", "ACCT_PUB")
    val pub = spark.table("trips_secure_vw")
    // publisher: every program, unmasked names
    assert(pub.count() >= nycha.count())
    assert(pub.filter(col("start_station_name").startsWith("REDACTED")).count() === 0)
  }

  test("consumption report matches a directly-computed governed aggregate") {
    SecureShare.registerTripsSecureView(spark, pipe)
    spark.conf.set("graft.current_account", "ACCT_JCHA")
    val report = SecureShare.consumptionReport(spark)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq

    val expected = pipe.trips()
      .join(pipe.programs(), "program_id")
      .filter(col("program_name").startsWith("NATION_2"))
      .groupBy("program_name").agg(count(lit(1)).as("n"))
      .collect().map(r => ("" + r.getString(0), "ACCT_JCHA", r.getLong(1)))
      .sortBy(t => (-t._3, t._1)).toSeq
    assert(report === expected)
    assert(report.nonEmpty)
  }

  test("share lifecycle: grant/revoke + account add/remove govern access " +
    "(dp_demo.sql:241-290)") {
    SecureShare.registerTripsSecureView(spark, pipe)
    val share = SecureShare.createShare(
      "snowflake_demo", "Share trip data with housing authorities.")
    try {
      // `show shares like 'snowflake_demo%'` — visible, no consumers yet
      val shown = SecureShare.showShares(spark, "snowflake_demo%").collect()
      assert(shown.map(_.getString(0)).toSeq === Seq("snowflake_demo"))
      assert(shown.head.getString(2) === "")

      share.grantSelect("trips_secure_vw")
      share.addAccounts("ACCT_NYCHA", "ACCT_JCHA")

      // the view select alone is NOT enough: the reference grants usage
      // on the database and schema first (dp_demo.sql:214-215) and the
      // consumer resolves the chain db → schema → view.
      spark.conf.set("graft.current_account", "ACCT_NYCHA")
      intercept[SecurityException] {
        SecureShare.consumerTable(spark, share, "trips_secure_vw")
      }
      share.grantUsage("database", "snowflake_demo")
      intercept[SecurityException] { // schema usage still missing
        SecureShare.consumerTable(spark, share, "trips_secure_vw")
      }
      share.grantUsage("schema", "snowflake_demo.modelled")

      // `desc share`: all three grant kinds, like the reference's
      // "we granted access to database, schema and one view" (:246)
      assert(share.describe(spark).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
        === Seq(
          ("DATABASE", "snowflake_demo", "USAGE"),
          ("SCHEMA", "snowflake_demo.modelled", "USAGE"),
          ("VIEW", "trips_secure_vw", "SELECT")))

      // consumer sees governed rows through the share
      val n0 = SecureShare.consumptionReport(spark, share).count()
      assert(n0 > 0)

      // revoking the SCHEMA usage (any link in the chain) also cuts
      // access, and re-granting restores it
      share.revokeUsage("schema", "snowflake_demo.modelled")
      intercept[SecurityException] {
        SecureShare.consumerTable(spark, share, "trips_secure_vw")
      }
      share.grantUsage("schema", "snowflake_demo.modelled")
      assert(SecureShare.consumptionReport(spark, share).count() === n0)

      // revoke → access is lost (dp_demo.sql:287-288)
      share.revokeSelect("trips_secure_vw")
      intercept[SecurityException] {
        SecureShare.consumerTable(spark, share, "trips_secure_vw")
      }

      // re-grant → access is regained (dp_demo.sql:289-290)
      share.grantSelect("trips_secure_vw")
      assert(SecureShare.consumptionReport(spark, share).count() === n0)

      // an account removed from the share list loses access even while
      // the grant stands (alter share add/remove accounts, :259)
      share.removeAccounts("ACCT_NYCHA")
      intercept[SecurityException] {
        SecureShare.consumerTable(spark, share, "trips_secure_vw")
      }
      // ...and an account never on the list was never able to attach
      spark.conf.set("graft.current_account", "ACCT_STRANGER")
      intercept[SecurityException] {
        SecureShare.consumerTable(spark, share, "trips_secure_vw")
      }
      // JCHA remains a consumer throughout
      spark.conf.set("graft.current_account", "ACCT_JCHA")
      assert(SecureShare.consumptionReport(spark, share).count() > 0)
    } finally SecureShare.dropShare("snowflake_demo")
  }
}
