package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions
import graft.pipeline._
import graft.serve.SecureShare

/** The reference demo script replayed END-TO-END as one flow, in the
  * reference's statement order (dp_demo.sql:13-295): reset, source
  * check, create pipe, resume tasks, produce inside the warehouse
  * resize (ingest pulse runs at `large`, paired resize-back after),
  * monitoring (dashboard, task_history incl. SKIPPED, copy_history
  * top-16), suspend, secure-share consumption per account, revoke /
  * regain, purge and final empty-stage check.
  *
  * Every piece has its own spec elsewhere; this test exercises the
  * ORDER-DEPENDENT compositions — resize wrapping live ingest, purge
  * after consumption, reset over a previous run's leftovers — with the
  * demo's golden counts rescaled to the fixture window (dp_demo.sql's
  * 51,767 trips / 930 stations / 61 programs / 2,883-per-account become
  * the window-derived expected counts per FIXTURES.md §A).
  */
class DemoReplaySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def asAccount[T](acct: String)(body: => T): T = {
    val prior = spark.conf.getOption(GraftFunctions.AccountConfKey)
    spark.conf.set(GraftFunctions.AccountConfKey, acct)
    try body
    finally prior match {
      case Some(p) => spark.conf.set(GraftFunctions.AccountConfKey, p)
      case None => spark.conf.unset(GraftFunctions.AccountConfKey)
    }
  }

  test("dp_demo.sql steps 1-8 replay in the reference's order with golden counts") {
    val root = Files.createTempDirectory("graft_demo_replay").toString
    val paths = PipelinePaths(root)
    val clock = new ManualClock(
      java.sql.Timestamp.valueOf("1995-02-01 00:00:00").getTime)

    // ---- "the last demo": a previous run leaves staged files and
    // populated tables behind, so the reset has real work to do --------
    val stale = new Pipeline(spark, paths, clock, taskIntervalSec = 1)
    Producer.streamData(spark, sf, paths.stage, "01/02/1995", "01/02/1995")
    stale.runAvailableNow()
    assert(stale.trips().count() > 0, "stale run must leave rows to reset")
    assert(Stage.list(spark, paths.stage).count() > 0)

    // ---- RESET (dp_demo.sql:13-19): rm @stage; truncate if exists ----
    Stage.list(spark, paths.stage).select("name").collect()
      .foreach(r => Stage.rm(spark, paths.stage, r.getString(0)))
    assert(Stage.list(spark, paths.stage).count() === 0,
      "rm @stage left files behind")
    Seq(paths.rawTrips, paths.trips, paths.stations, paths.programs)
      .foreach(Ddl.truncate(spark, _))
    Ddl.truncate(spark, s"$root/modelled/never_created") // if-exists branch
    assert(stale.trips().count() === 0 && stale.rawTrips().count() === 0 &&
      stale.stations().count() === 0 && stale.programs().count() === 0,
      "truncate left rows behind")
    // create-or-replace (dp_setup.sql recreates every object; a replaced
    // pipe also forgets its load history): drop the physical layout so
    // the new pipeline starts from clean partitioned tables and a fresh
    // file-source log
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new org.apache.hadoop.fs.Path(root).toUri,
      spark.sparkContext.hadoopConfiguration)
    Seq(paths.rawTrips, paths.trips, paths.stations, paths.programs,
        paths.copyHistory, paths.taskHistory, paths.checkpoint)
      .foreach(p => fs.delete(new org.apache.hadoop.fs.Path(p), true))

    // ---- Step 1 (dp_demo.sql:30-33): the source share is query-ready -
    val src = CitibikeSource.trips(spark, sf)
    assert(src.count() > 0)
    assert(src.limit(5).count() === 5) // "sample some data"
    def window1 = src.filter(
      to_date(col("starttime")).between("1995-01-02", "1995-01-08"))
    val expTrips = window1.count() // the 51,767 analogue
    val expProgs = window1.select("program_id").distinct().count() // 61
    val expStations = window1.select(col("start_station_id").as("id"))
      .union(window1.select(col("end_station_id").as("id")))
      .distinct().count() // 930

    // ---- Steps 3-5 (dp_demo.sql:45-61): create pipe + streams; the
    // stage is empty and nothing is pending ----------------------------
    val pipe = new Pipeline(spark, paths, clock, taskIntervalSec = 60)
    assert(pipe.pipeStatus().contains("\"pendingFileCount\":0"))

    // ---- Step 6 (dp_demo.sql:95-99): resume tasks — armed; each
    // subsequent pulse is one AvailableNow drain ------------------------

    // ---- Step 2 (dp_demo.sql:110-145): resize to LARGE, produce, let
    // the pipeline flow, monitor — resize-back only after the window ---
    val whHist = s"$root/ops/wh_history"
    val priorParallelism = spark.conf.get("spark.sql.shuffle.partitions")
    val nDays = Ddl.withWarehouseSize(spark, "large", Some(whHist), clock) {
      assert(spark.conf.get("spark.sql.shuffle.partitions") ===
        Ddl.warehouseSizes("large").toString)
      val n = Producer.streamData(
        spark, sf, paths.stage, "01/02/1995", "01/08/1995")
      // list @stage (dp_demo.sql:118): one file set per day
      assert(Stage.list(spark, paths.stage).count() === n)
      // select $1 from @stage (dp_demo.sql:123): the 51,767 analogue,
      // queryable in place before any load
      assert(Stage.scanDollar1(spark, paths.stage).count() === expTrips)
      // dashboard BEFORE the pulse: everything is still pending
      val pre = pipe.dashboard().head
      assert(pre.getAs[Long]("pending_file_count") === n)
      assert(pre.getAs[Long]("trips_raw") === 0L)
      // "let it flow": the resumed tasks' pulse runs INSIDE the large
      // window — the heavy ingest is what the resize was for
      pipe.runAvailableNow()
      n
    }
    // resize-back (dp_demo.sql:145) restored the prior parallelism, and
    // both ALTERs are visible where monitoring looks
    assert(spark.conf.get("spark.sql.shuffle.partitions") === priorParallelism)
    val whRows = spark.read.parquet(whHist)
      .select("name", "state").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(whRows === Set(("alter_warehouse_size_large", "SUCCEEDED"),
      ("alter_warehouse_size_restore", "SUCCEEDED")))

    // ---- Step 5 checks (dp_demo.sql:148-165): raw landed, streams
    // drained, modelled tables carry the golden counts ------------------
    assert(pipe.rawTrips().count() === expTrips) // 51,767 analogue
    val dash = pipe.dashboard().head
    assert(dash.getAs[Long]("recs_in_stream") === 0L) // streams consumed
    assert(dash.getAs[Long]("pending_file_count") === 0L)
    assert(pipe.trips().count() === expTrips)       // 51,767
    assert(pipe.programs().count() === expProgs)    // 61
    assert(pipe.stations().count() === expStations) // 930

    // ---- operational questions (dp_demo.sql:166-188) ------------------
    val th1 = pipe.taskHistoryRecent().select("name", "state").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(th1("push_trips") === "SUCCEEDED")
    assert(th1("push_programs") === "SUCCEEDED")
    assert(th1("push_stations") === "SUCCEEDED")
    // how long to next task run? (dp_demo.sql:172-175)
    assert(dash.getAs[Long]("time_to_next_pulse") === 60L)
    // files processed in the last 15 minutes + the top-16 listing
    assert(pipe.copyHistory().count() === nDays)
    val top16 = pipe.copyHistoryTop16().collect()
    assert(top16.length === math.min(16L, nDays).toInt)
    // an empty pulse surfaces SKIPPED rows ("note SUCEEDED and SKIPPED",
    // dp_demo.sql:170) and — purge running after consumption of the
    // committed batch — clears the loaded files from the stage
    new java.io.File(s"$root/stage/snowpipe_demo_empty.json").createNewFile()
    clock.advance(60 * 1000)
    pipe.runAvailableNow()
    assert(pipe.trips().count() === expTrips, "empty pulse changed the facts")
    val skipped = pipe.taskHistoryRecent()
      .filter(col("state") === "SKIPPED").select("name").collect()
      .map(_.getString(0)).toSet
    assert(skipped.contains("push_trips"))
    assert(Stage.list(spark, paths.stage).count() === 1,
      "deferred purge did not clear the loaded files")

    // ---- suspend tasks (dp_demo.sql:191-193): counts are stable ------
    assert(pipe.trips().count() === expTrips)       // 51,767 again
    assert(pipe.stations().count() === expStations) // 930
    assert(pipe.programs().count() === expProgs)    // 61

    // ---- Step 7 (dp_demo.sql:208-290): secure share ------------------
    SecureShare.registerTripsSecureView(spark, pipe)
    val share = SecureShare.createShare("snowflake_demo",
      "Share trip data with housing authorities.")
    share.grantUsage("DATABASE", SecureShare.DemoDatabase)
    share.grantUsage("SCHEMA",
      s"${SecureShare.DemoDatabase}.${SecureShare.DemoSchema}")
    share.grantSelect("trips_secure_vw")
    assert(SecureShare.showShares(spark, "snowflake_demo%").count() === 1)
    assert(share.describe(spark).count() === 3) // db + schema + view

    // set nycha/jcha from the security table (dp_demo.sql:255-256)
    val sec = SecureShare.security(spark)
    val nycha = sec.filter(col("name") === "NYCHA")
      .select("account").head.getString(0)
    val jcha = sec.filter(col("name") === "JCHA")
      .select("account").head.getString(0)
    share.addAccounts(nycha, jcha)

    // expected per-account trips: the view's LIKE filter over programs
    def expFor(prefix: String): Long = pipe.trips()
      .join(pipe.programs().filter(col("program_name").startsWith(prefix)),
        "program_id").count()
    val nychaExp = expFor("NATION_1") // the 2,883 analogue
    val jchaExp = expFor("NATION_2")  // the 641 analogue
    assert(nychaExp > 0 && jchaExp > 0)
    // the two authorities' program prefixes are disjoint, so neither
    // consumer can see the other's trips (nor all of them)
    assert(nychaExp + jchaExp <= expTrips)

    asAccount(nycha) {
      val vw = SecureShare.consumerTable(spark, share, "trips_secure_vw")
      assert(vw.count() === nychaExp)
      assert(vw.filter(!col("start_station_name").startsWith("REDACTED ("))
        .count() === 0, "consumer saw unmasked station names")
      val report = SecureShare.consumptionReport(spark, share)
      assert(report.agg(sum("n")).head.getLong(0) === nychaExp)
      assert(report.filter(col("acct") =!= nycha).count() === 0)
    }
    asAccount(jcha) {
      assert(SecureShare.consumerTable(spark, share, "trips_secure_vw")
        .count() === jchaExp)
    }

    // GOVERN ACCESS (dp_demo.sql:287-290): revoke → lost, grant → back
    share.revokeSelect("trips_secure_vw")
    asAccount(nycha) {
      intercept[SecurityException] {
        SecureShare.consumerTable(spark, share, "trips_secure_vw")
      }
    }
    share.grantSelect("trips_secure_vw")
    asAccount(nycha) {
      assert(SecureShare.consumerTable(spark, share, "trips_secure_vw")
        .count() === nychaExp)
    }

    // ---- Step 8 (dp_demo.sql:294-295): purge, then the stage shows
    // nothing ----------------------------------------------------------
    assert(pipe.purge() === 0, "loaded files should already be purged")
    Stage.list(spark, paths.stage).select("name").collect()
      .foreach(r => Stage.rm(spark, paths.stage, r.getString(0)))
    assert(Stage.list(spark, paths.stage).count() === 0)
    assert(pipe.pipeStatus().contains("\"pendingFileCount\":0"))
  }
}
