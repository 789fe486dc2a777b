package graft.serve

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.GraftFunctions
import graft.pipeline.Pipeline

/** The reference's secure share, as SQL text (dp_demo.sql:222-259): the
  * verbatim view shape — ON-less inner-join chain with every predicate
  * in WHERE, `current_account()` row filter, `iff(... IN (publisher
  * subquery), name, 'REDACTED (' || md5 || ')')` masking — registered
  * over the pipeline's modelled tables. Catalyst recovers the equi-joins
  * from the chain (`PushPredicateThroughJoin`/`ReorderJoin`, SURVEY §4)
  * and folds `current_account()` to the session constant, so the account
  * filter reaches the security scan before any fact rows move.
  */
object SecureShare {

  /** The citibike-shaped security table (dp_demo.sql:250 CTAS analogue):
    * account → program-name LIKE filter.
    */
  def security(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("Publisher Account", "ACCT_PUB", "%"),
      ("NYCHA", "ACCT_NYCHA", "NATION_1%"),
      ("JCHA", "ACCT_JCHA", "NATION_2%")
    ).toDF("name", "account", "filter")
  }

  /** Register `trips_secure_vw` (+ its base views) for the given
    * pipeline's modelled tables. Consumers then set the session account
    * (`spark.conf.set("graft.current_account", ...)` ≙ the reader
    * account) and query the view by name.
    */
  def registerTripsSecureView(spark: SparkSession, pipe: Pipeline): Unit = {
    GraftFunctions.register(spark)
    pipe.trips().createOrReplaceTempView("graft_m_trips")
    pipe.programs().createOrReplaceTempView("graft_m_programs")
    pipe.stations().createOrReplaceTempView("graft_m_stations")
    security(spark).createOrReplaceTempView("graft_m_security")
    spark.sql("""
      CREATE OR REPLACE TEMPORARY VIEW trips_secure_vw AS
        SELECT current_account() AS acct,
               p.program_name,
               date_trunc('hour', t.starttime) AS starttime_hr,
               iff(current_account() IN (SELECT account FROM graft_m_security WHERE name = 'Publisher Account'),
                   sts.station_name, 'REDACTED (' || md5(sts.station_name) || ')') AS start_station_name,
               iff(current_account() IN (SELECT account FROM graft_m_security WHERE name = 'Publisher Account'),
                   ste.station_name, 'REDACTED (' || md5(ste.station_name) || ')') AS end_station_name
        FROM graft_m_trips t
        INNER JOIN graft_m_security s
        INNER JOIN graft_m_programs p
        INNER JOIN graft_m_stations sts
        INNER JOIN graft_m_stations ste
        WHERE p.program_id = t.program_id
          AND p.program_name LIKE s.filter
          AND sts.station_id = t.start_station_id
          AND ste.station_id = t.end_station_id
          AND s.account = current_account()
    """)
  }

  /** The demo's consumption query (dp_demo.sql:267-270). */
  def consumptionReport(spark: SparkSession): DataFrame =
    spark.sql("""
      SELECT program_name, acct, count(*) AS n
      FROM trips_secure_vw
      GROUP BY 1, 2
      ORDER BY 3 DESC, program_name
    """)
}
