package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Statement-level Snowflake-dialect replay (SURVEY §7.3 "optional
  * polish"; r10 verdict "what's missing #1"): a STRING-level rewrite
  * that lets the monitoring / consumption statements of the reference
  * demo script (`dp_demo.sql:118-142,165-188,250-290`) run near-verbatim
  * through `spark.sql`, closing the last fidelity gap a user migrating
  * the demo would hit. This is deliberately a textual layer, not a
  * parser: the function surface (`iff`, `current_account`,
  * `graft_pipe_status`) is already registered in the session
  * (GraftFunctions), Spark 4 natively accepts most of the remaining
  * dialect (`||`, `::` casts, `timestampdiff`, ordinal GROUP BY), and
  * the handful of constructs Spark's parser cannot take are each a
  * local, explainable substitution:
  *
  *   - `table(information_schema.copy_history(table_name=>…,
  *     start_time=>X))` → `(SELECT * FROM graft_copy_history WHERE
  *     last_load_time > X)` — the table function becomes the pipeline's
  *     metrics view with the window argument preserved as a predicate;
  *     `task_history()` likewise (no arguments in the demo).
  *   - `system$pipe_status` → `graft_pipe_status` (a `$` cannot appear
  *     in a parsed function identifier; the target function reads the
  *     conf key the pipeline publishes to).
  *   - `parse_json(x):field::type` → `try_variant_get(parse_json(x),
  *     '$.field', 'type')` — Snowflake's `:` path extraction is not
  *     Spark syntax; the typed form consumes the adjacent `::` cast.
  *   - `dateadd(unit, n, ts)` → `timestampadd(...)` (Spark's `dateadd`
  *     is the 2-argument day-adder; the 3-argument Snowflake form maps
  *     exactly onto `timestampadd`).
  *   - `date_trunc(hour, ts)` → `date_trunc('hour', ts)` — Snowflake
  *     takes the unit as a bare keyword (`dp_demo.sql:225`), Spark as a
  *     string literal.
  *   - `current_time()` → `current_timestamp` — Snowflake's TIME-typed
  *     now, used only inside `dateadd(minute, -15, current_time())`
  *     (`dp_demo.sql:167`) where the 15-minutes-ago intent maps onto
  *     the timestamp form (and then onto the pinned literal below).
  *   - `select top N …` → `select … LIMIT N` (appended after the final
  *     ORDER BY, preserving top-k semantics — plans as
  *     TakeOrderedAndProject like the repo's o4 entry).
  *   - `@db.schema.stage` references → caller-supplied view names over
  *     `Stage.scanRelation`; `metadata$filename` and positional `$N`
  *     become back-quoted column identifiers of that view.
  *   - `$var` session variables → literal substitution from the
  *     session's variable map (numbers raw, everything else quoted).
  *   - `current_timestamp` → a pinned timestamp literal when the caller
  *     supplies one (the pipeline's Clock), making replayed statements
  *     deterministic under test exactly like the pipeline's own
  *     dashboard.
  *   - an `ORDER BY col [desc]` sitting immediately before a subquery's
  *     closing `)` is dropped: Snowflake tolerates ordering an
  *     aggregate-only scalar subquery (`dp_demo.sql:129-131`), Spark
  *     rejects it, and ordering a one-row result carries no semantics.
  *   - `as "Alias"` → ``as `Alias` `` (double-quoted identifiers are
  *     string literals to Spark's default parser).
  *
  * `DialectSession` adds the statement KINDS around the queries: `set
  * var = (select …)`, `alter session set/unset`, `grant/revoke select
  * on view … to/from share`, `alter share add/remove accounts`,
  * `list @stage`, `show shares like '…'`, `desc share` — dispatched
  * onto the session variable map, session conf
  * (`simulated_data_sharing_consumer` maps to the same conf key
  * `current_account()` folds from, exactly the reference's simulation
  * trick), the `SecureShare.Share` governance object, and the stage /
  * share catalogs.
  */
object SnowflakeDialect {

  /** Strip `-- …` line comments and a trailing `;`. The demo's
    * statements carry no `--` inside string literals; a full tokenizer
    * would be scope beyond a replay shim.
    */
  private[graft] def clean(stmt: String): String =
    stmt.replaceAll("(?m)--.*$", "").trim.stripSuffix(";").trim

  /** Index of the `(` matching the one at `open`. */
  private def matching(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return i
        case '\'' => // skip string literal
          i += 1
          while (i < s.length && s.charAt(i) != '\'') i += 1
        case _ =>
      }
      i += 1
    }
    throw new IllegalArgumentException(s"unbalanced parens in: $s")
  }

  /** Split an argument list on top-level commas. */
  private def splitArgs(args: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < args.length) {
      args.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case '\'' => i += 1; while (i < args.length && args.charAt(i) != '\'') i += 1
        case ',' if depth == 0 => out += args.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += args.substring(start)
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** `table(information_schema.<fn>(args))` → the metrics view, with
    * copy_history's `start_time=>X` preserved as a window predicate.
    */
  private def rewriteInfoSchema(sql0: String): String = {
    var s = sql0
    val re = java.util.regex.Pattern.compile(
      "(?i)table\\s*\\(\\s*information_schema\\.(\\w+)\\s*(\\()")
    var m = re.matcher(s)
    while (m.find()) {
      val fn = m.group(1).toLowerCase
      val argsOpen = m.start(2)
      val argsClose = matching(s, argsOpen)
      val outerClose = s.indexOf(')', argsClose + 1) // the table()'s own
      require(outerClose >= 0 && s.substring(argsClose + 1, outerClose).trim.isEmpty,
        s"malformed table() call in: $sql0")
      val kvs = splitArgs(s.substring(argsOpen + 1, argsClose))
        .map { a =>
          val i = a.indexOf("=>")
          if (i >= 0) (a.take(i).trim.toLowerCase, a.drop(i + 2).trim)
          else ("", a)
        }.toMap
      val replacement = (fn, kvs.get("start_time")) match {
        case ("copy_history", Some(start)) =>
          s"(SELECT * FROM graft_copy_history WHERE last_load_time > $start)"
        case ("copy_history", None) => "graft_copy_history"
        case ("task_history", _) => "graft_task_history"
        case (other, _) => s"graft_$other"
      }
      s = s.substring(0, m.start) + replacement + s.substring(outerClose + 1)
      m = re.matcher(s)
    }
    s
  }

  /** `<balanced-expr>:field[::type]` → `[try_]variant_get(expr,
    * '$.field'[, 'type'])`. Only the `)`-preceded form occurs in the
    * demo (the path always hangs off `parse_json(...)`).
    */
  private def rewriteVariantPaths(sql0: String): String = {
    var s = sql0
    val re = java.util.regex.Pattern.compile("\\)\\s*:\\s*([A-Za-z_]\\w*)")
    var m = re.matcher(s)
    while (m.find()) {
      val close = m.start // index of ')'
      // walk back to the matching '(' then over the callee identifier
      var depth = 0
      var i = close
      var open = -1
      while (i >= 0 && open < 0) {
        s.charAt(i) match {
          case ')' => depth += 1
          case '(' => depth -= 1; if (depth == 0) open = i
          case _ =>
        }
        i -= 1
      }
      require(open >= 0, s"unbalanced parens in: $sql0")
      var start = open
      while (start > 0 && (s.charAt(start - 1).isLetterOrDigit ||
        "_.$".contains(s.charAt(start - 1)))) start -= 1
      val expr = s.substring(start, close + 1)
      val field = m.group(1)
      val afterField = m.end
      val castRe = java.util.regex.Pattern.compile("\\G\\s*::\\s*(\\w+)")
      val cm = castRe.matcher(s)
      cm.region(afterField, s.length)
      val (replacement, end) =
        if (cm.find()) {
          val typ = cm.group(1).toLowerCase match {
            case "number" => "bigint"
            case t => t
          }
          (s"try_variant_get($expr, '$$.$field', '$typ')", cm.end)
        } else (s"variant_get($expr, '$$.$field')", afterField)
      s = s.substring(0, start) + replacement + s.substring(end)
      m = re.matcher(s)
    }
    s
  }

  /** `select top N …` → `select … LIMIT N` appended at statement end. */
  private def rewriteTopN(sql0: String): String = {
    val re = java.util.regex.Pattern.compile("(?i)\\bselect\\s+top\\s+(\\d+)\\s+")
    val m = re.matcher(sql0)
    if (!m.find()) sql0
    else sql0.substring(0, m.start) + "select " +
      sql0.substring(m.end) + s" LIMIT ${m.group(1)}"
  }

  /** Rewrite one Snowflake statement into Spark SQL.
    *
    * @param tableMap  reference object name (qualified table, bare view,
    *                  or `@stage` reference — trailing `/` ignored) →
    *                  registered Spark view name; matched
    *                  case-insensitively, longest name first
    * @param vars      session variables for `$var` substitution
    * @param now       pins `current_timestamp` to a literal (the
    *                  pipeline Clock) when supplied
    */
  def rewrite(stmt: String, tableMap: Map[String, String] = Map.empty,
      vars: Map[String, String] = Map.empty,
      now: Option[java.sql.Timestamp] = None): String = {
    import java.util.regex.Matcher.quoteReplacement
    var s = clean(stmt)
    s = rewriteInfoSchema(s)
    s = s.replaceAll("(?i)system\\$pipe_status", "graft_pipe_status")
    s = rewriteVariantPaths(s)
    s = s.replaceAll("(?i)\\bdateadd\\s*\\(", "timestampadd(")
    // bare-keyword unit → string literal; a quoted unit never matches
    // ([A-Za-z_] excludes the quote)
    s = s.replaceAll("(?i)\\bdate_trunc\\s*\\(\\s*([A-Za-z_]+)\\s*,", "date_trunc('$1',")
    // \b stops current_timestamp from matching (its 's' is a word char)
    s = s.replaceAll("(?i)\\bcurrent_time\\b\\s*\\(\\s*\\)", "current_timestamp")
    s = s.replaceAll("(?i)::\\s*number\\b", "::bigint")
    s = rewriteTopN(s)
    // stage references before table names and $-rules: their names can
    // contain dots and their columns carry literal $s
    val stageRe = java.util.regex.Pattern.compile("@[\\w.]+/?")
    val sm = stageRe.matcher(s)
    val sb = new StringBuffer
    while (sm.find()) {
      val ref = sm.group.stripSuffix("/")
      val target = tableMap.collectFirst {
        case (k, v) if k.equalsIgnoreCase(ref) => v
      }.getOrElse(throw new IllegalArgumentException(
        s"no tableMap entry for stage reference $ref"))
      sm.appendReplacement(sb, quoteReplacement(target))
    }
    sm.appendTail(sb)
    s = sb.toString
    s = s.replaceAll("(?i)\\bmetadata\\$filename\\b",
      quoteReplacement("`metadata$filename`"))
    s = s.replaceAll("(?<![\\w`$])\\$(\\d+)\\b", "`\\$$1`")
    now.foreach { ts =>
      s = s.replaceAll("(?i)\\bcurrent_timestamp\\b(\\s*\\(\\s*\\))?",
        quoteReplacement(s"timestamp'$ts'"))
    }
    // object names, longest first so qualified names win over bare ones
    tableMap.toSeq.filterNot(_._1.startsWith("@"))
      .sortBy(-_._1.length).foreach { case (k, v) =>
        s = s.replaceAll(
          "(?i)(?<![\\w.$])" + java.util.regex.Pattern.quote(k) + "(?![\\w.])",
          quoteReplacement(v))
      }
    // ORDER BY directly before a subquery's `)`: Snowflake tolerates it
    // on an aggregate-only scalar subquery, Spark rejects it, one-row
    // ordering has no semantics
    s = s.replaceAll("(?i)\\border\\s+by\\s+[\\w.]+(\\s+(?:asc|desc))?\\s*\\)", ")")
    s = s.replaceAll("(?i)\\bas\\s+\"([^\"]+)\"", "as `$1`")
    // session variables last ($N positionals are already back-quoted;
    // the lookbehind spares `metadata$filename`-style column names and
    // the '$.field' JSON paths emitted above)
    val varRe = java.util.regex.Pattern.compile("(?<![\\w`.])\\$([A-Za-z_]\\w*)")
    val vm = varRe.matcher(s)
    val vb = new StringBuffer
    while (vm.find()) {
      val name = vm.group(1).toLowerCase
      val value = vars.getOrElse(name, throw new IllegalArgumentException(
        s"session variable $$$name is not set"))
      val lit =
        if (value.matches("-?\\d+(\\.\\d+)?")) value
        else "'" + value.replace("'", "''") + "'"
      vm.appendReplacement(vb, quoteReplacement(lit))
    }
    vm.appendTail(vb)
    vb.toString
  }
}

/** Stateful replay of a demo-script statement sequence: session
  * variables, session conf, and share governance around the rewritten
  * queries. `execute` returns a DataFrame for query statements, None
  * for control statements.
  */
final class DialectSession(spark: SparkSession,
    tableMap: Map[String, String] = Map.empty,
    now: Option[java.sql.Timestamp] = None,
    share: Option[graft.serve.SecureShare.Share] = None,
    stageDirs: Map[String, String] = Map.empty) {

  GraftFunctions.register(spark)
  private val vars = scala.collection.mutable.Map.empty[String, String]

  // both mutable so a whole-script replay (DemoScriptSession) can bind
  // them mid-sequence: the share is CREATED by a script statement, and
  // the pinned `current_timestamp` advances with the script's clock
  // across pulses
  private var shareOpt: Option[graft.serve.SecureShare.Share] = share
  private var nowOpt: Option[java.sql.Timestamp] = now

  /** Bind the share a later `grant/revoke/alter share/desc share`
    * statement governs (`create or replace share`, dp_demo.sql:208).
    */
  def attachShare(s: graft.serve.SecureShare.Share): Unit = shareOpt = Some(s)

  /** Re-pin `current_timestamp` to the (advanced) script clock. */
  def pinNow(ts: java.sql.Timestamp): Unit = nowOpt = Some(ts)

  /** `alter session set simulated_data_sharing_consumer = …` lands on
    * the SAME conf key `current_account()` folds from — the reference's
    * own trick for previewing a consumer's view of the data
    * (dp_demo.sql:263).
    */
  private def confKey(key: String): String = key.toLowerCase match {
    case "simulated_data_sharing_consumer" => GraftFunctions.AccountConfKey
    case k => s"graft.session.$k"
  }

  private def resolve(value: String): String = {
    val v = value.trim
    if (v.startsWith("$")) vars.getOrElse(v.drop(1).toLowerCase,
      throw new IllegalArgumentException(s"session variable $v is not set"))
    else v.stripPrefix("'").stripSuffix("'")
  }

  /** The rewritten Spark SQL for `stmt` under the session's current
    * variable/now state — for callers that embed it in larger DDL (the
    * script replay's `create secure view … as <body>`).
    */
  def rewriteOnly(stmt: String): String =
    SnowflakeDialect.rewrite(stmt, tableMap, vars.toMap, nowOpt)

  def sql(stmt: String): DataFrame = spark.sql(rewriteOnly(stmt))

  def execute(stmt: String): Option[DataFrame] = {
    val s = SnowflakeDialect.clean(stmt)
    val setVar = "(?is)^set\\s+(\\w+)\\s*=\\s*\\((.*)\\)$".r
    val alterSet = "(?is)^alter\\s+session\\s+set\\s+(\\w+)\\s*=\\s*(.+)$".r
    val alterUnset = "(?is)^alter\\s+session\\s+unset\\s+(\\w+)$".r
    val grantView = "(?is)^grant\\s+select\\s+on\\s+view\\s+([\\w.]+)\\s+to\\s+share\\s+[\\w.]+$".r
    val revokeView = "(?is)^revoke\\s+select\\s+on\\s+view\\s+([\\w.]+)\\s+from\\s+share\\s+[\\w.]+$".r
    val shareAccounts = "(?is)^alter\\s+share\\s+[\\w.]+\\s+(add|remove)\\s+accounts\\s*=\\s*(.+)$".r
    val listStage = "(?is)^(?:list|ls)\\s+(@[\\w.]+)/?$".r
    val showShares = "(?is)^show\\s+shares\\s+like\\s+'([^']*)'$".r
    val descShare = "(?is)^desc(?:ribe)?\\s+share\\s+[\\w.]+$".r
    def simpleName(qualified: String) = qualified.split('.').last
    s match {
      case listStage(ref) =>
        // `list @stage` (dp_demo.sql:36,118): the stage listing relation
        val dir = stageDirs.collectFirst {
          case (k, v) if k.equalsIgnoreCase(ref) => v
        }.getOrElse(throw new IllegalArgumentException(
          s"no stageDirs entry for $ref"))
        Some(graft.pipeline.Stage.list(spark, dir))
      case showShares(pattern) =>
        Some(graft.serve.SecureShare.showShares(spark, pattern))
      case descShare() =>
        Some(shareOpt.getOrElse(throw new IllegalArgumentException(
          "desc share requires a share-attached DialectSession"))
          .describe(spark))
      case setVar(name, query) =>
        vars(name.toLowerCase) = String.valueOf(sql(query).collect()(0).get(0))
        None
      case alterSet(key, value) =>
        spark.conf.set(confKey(key), resolve(value)); None
      case alterUnset(key) =>
        spark.conf.unset(confKey(key)); None
      case grantView(view) =>
        shareOpt.foreach(_.grantSelect(simpleName(view))); None
      case revokeView(view) =>
        shareOpt.foreach(_.revokeSelect(simpleName(view))); None
      case shareAccounts(op, accts) =>
        val resolved = accts.split(',').map(resolve).toSeq
        shareOpt.foreach { sh =>
          if (op.equalsIgnoreCase("add")) sh.addAccounts(resolved: _*)
          else sh.removeAccounts(resolved: _*)
        }
        None
      case _ => Some(sql(s))
    }
  }
}
