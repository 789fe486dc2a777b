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

  // ---- share lifecycle (dp_demo.sql:208-259, 287-290) -----------------
  //
  // A share is governance METADATA: which objects are granted to it and
  // which consumer accounts may attach. All of it is driver-side and
  // bounded (a handful of rows), never data-scale. Enforcement happens at
  // the consumer entry point: a query through the share succeeds only
  // while the view is granted AND the session account is on the share's
  // account list — so `revoke` / `alter share remove accounts` replay the
  // reference's "show access is lost / regained" demo.

  /** A grant held by a share: object kind + name + privilege. The
    * reference grants THREE kinds (dp_demo.sql:214-215, 245): USAGE on
    * the database, USAGE on the schema, SELECT on the view — a consumer
    * resolves the view only when the whole chain is granted, so
    * revoking any link (not just the view select) cuts access.
    */
  final case class Grant(kind: String, objectName: String, privilege: String)

  /** One outbound share: granted objects + consumer account list.
    * Mirrors `create share` (dp_demo.sql:208), `grant usage on
    * database/schema ... to share` (:214-215), `grant select on view
    * ... to share` (:245), `revoke ... from share` (:287), `alter share
    * add/remove accounts` (:259).
    */
  final class Share(val name: String, val comment: String) {
    private var grantList = Set.empty[Grant]
    private var accountList = Set.empty[String]

    def grantSelect(view: String): Unit =
      synchronized { grantList += Grant("VIEW", view, "SELECT") }
    def revokeSelect(view: String): Unit =
      synchronized { grantList -= Grant("VIEW", view, "SELECT") }
    /** `grant usage on database|schema <name> to share` — `kind` is
      * "DATABASE" or "SCHEMA" (dp_demo.sql:214-215).
      */
    def grantUsage(kind: String, objectName: String): Unit =
      synchronized { grantList += Grant(kind.toUpperCase, objectName, "USAGE") }
    def revokeUsage(kind: String, objectName: String): Unit =
      synchronized { grantList -= Grant(kind.toUpperCase, objectName, "USAGE") }
    def addAccounts(accounts: String*): Unit =
      synchronized { accountList ++= accounts }
    def removeAccounts(accounts: String*): Unit =
      synchronized { accountList --= accounts }

    def grants: Set[Grant] = synchronized(grantList)
    def grantedViews: Set[String] =
      grants.collect { case Grant("VIEW", v, "SELECT") => v }
    def hasUsage(kind: String, objectName: String): Boolean =
      grants.contains(Grant(kind.toUpperCase, objectName, "USAGE"))
    def accounts: Set[String] = synchronized(accountList)

    /** `desc share` (dp_demo.sql:246): every grant the share holds —
      * database and schema usage alongside the view select, like the
      * reference's "we granted access to database, schema and one view".
      */
    def describe(spark: SparkSession): DataFrame = {
      import spark.implicits._
      grants.toSeq.map(g => (g.kind, g.objectName, g.privilege))
        .sortBy(t => (t._1, t._2))
        .toDF("kind", "object_name", "privilege")
    }
  }

  private val shares =
    scala.collection.concurrent.TrieMap.empty[String, Share]

  /** `create or replace share <name>` (dp_demo.sql:208). */
  def createShare(name: String, comment: String = ""): Share = {
    val s = new Share(name, comment)
    shares.put(name, s)
    s
  }

  def dropShare(name: String): Unit = shares.remove(name)

  /** `show shares like '<pattern>'` (dp_demo.sql:210) — SQL LIKE
    * pattern, case-insensitive like Snowflake's SHOW.
    */
  def showShares(spark: SparkSession, pattern: String): DataFrame = {
    import spark.implicits._
    val re = java.util.regex.Pattern.quote(pattern.toLowerCase)
      .replace("%", "\\E.*\\Q").replace("_", "\\E.\\Q")
    shares.values.toSeq
      .filter(s => s.name.toLowerCase.matches(re))
      .map(s => (s.name, s.comment, s.accounts.toSeq.sorted.mkString(",")))
      .sortBy(_._1)
      .toDF("name", "comment", "accounts")
  }

  /** The demo namespace the shared view lives in (the reference's
    * `snowflake_demo.modelled.trips_secure_vw`, dp_demo.sql:245).
    */
  val DemoDatabase = "snowflake_demo"
  val DemoSchema = "modelled"

  /** Consumer-side access: query `view` through `share` as the session's
    * current account. Resolution walks the reference's grant chain in
    * order — database usage, schema usage, view select, account list —
    * and fails at the first missing link (revoking ANY of the three
    * grants, not just the view select, loses access; re-granting
    * restores it, dp_demo.sql:287-290).
    */
  def consumerTable(spark: SparkSession, share: Share, view: String,
      database: String = DemoDatabase, schema: String = DemoSchema): DataFrame = {
    val account = spark.conf.get(GraftFunctions.AccountConfKey, "")
    if (!share.hasUsage("DATABASE", database))
      throw new SecurityException(
        s"Database '$database' is not granted usage to share '${share.name}'")
    if (!share.hasUsage("SCHEMA", s"$database.$schema"))
      throw new SecurityException(
        s"Schema '$database.$schema' is not granted usage to share '${share.name}'")
    if (!share.grantedViews.contains(view))
      throw new SecurityException(
        s"View '$view' is not granted to share '${share.name}'")
    if (!share.accounts.contains(account))
      throw new SecurityException(
        s"Account '$account' is not a consumer of share '${share.name}'")
    spark.table(view)
  }

  /** The consumption report, routed through the share's access check. */
  def consumptionReport(spark: SparkSession, share: Share): DataFrame = {
    consumerTable(spark, share, "trips_secure_vw").createOrReplaceTempView(
      "graft_shared_trips_secure_vw")
    spark.sql("""
      SELECT program_name, acct, count(*) AS n
      FROM graft_shared_trips_secure_vw
      GROUP BY 1, 2
      ORDER BY 3 DESC, program_name
    """)
  }

  /** Drop the secure view (the producer-side teardown analogue). */
  def dropTripsSecureView(spark: SparkSession): Unit =
    spark.catalog.dropTempView("trips_secure_vw")
}
