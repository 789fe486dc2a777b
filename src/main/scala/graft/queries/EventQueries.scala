package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.streaming.EventStream

/** Event-time analytics over the `events` table — the batch faces of the
  * streaming transforms in graft.streaming (same code paths; the
  * streaming execution is checked for parity in StreamingSpec).
  */
object EventQueries extends QueryPack {

  /** ONE oracle for both e5 (unsalted) and e6 (salted) interval joins:
    * row-identity between the two is the stated contract — salting
    * changes only the physical distribution — so sharing the SQL value
    * enforces "SAME oracle" by construction (ADVICE r9: two copies of
    * the string could drift apart silently).
    */
  /** ONE oracle for e2 (window-function form) and e2b (native
    * `session_window` form): row-identity between the faces is the
    * contract (gap boundary aligned to `diff <= gap`, see
    * `EventStream.sessionizeNative`), so they share the SQL value for
    * the same anti-drift reason as the interval joins.
    */
  private val sessionOracle =
    """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) ts, user_id, value FROM events),
       l AS (SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) prev_ts FROM e),
       f AS (SELECT *, CASE WHEN prev_ts IS NULL OR epoch_ms(ts) - epoch_ms(prev_ts) > 3600000 THEN 1 ELSE 0 END AS new_session FROM l),
       s AS (SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) session_idx FROM f)
       SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
         count(*) AS n_events,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       FROM s GROUP BY user_id, session_idx ORDER BY user_id, session_start"""

  private val intervalJoinOracle =
    """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) ts, user_id,
        event_type, value FROM events)
       SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id,
         v.ts AS view_ts, c.ts AS click_ts, c.value AS click_value
       FROM e v JOIN e c ON v.user_id = c.user_id
         AND v.event_type = 'view' AND c.event_type = 'click'
         AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 240 MINUTE
       ORDER BY view_id, click_id"""

  val queries: Seq[Q] = Seq(

    // Tumbling 1-day window per event type (window() epoch-aligned in
    // UTC == date_trunc day), exact decimal sums.
    Q("e1_event_windowed_agg",
      (s, d) => EventStream.windowedAgg(Tables.load(s, d, "events"))
        .select(col("window_start").cast("timestamp_ntz").as("window_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("window_start", "event_type"),
      Some("""SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS window_start,
             event_type, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""")),

    // Gap-based sessionization via window functions (lag → gap flag →
    // running session index → per-session agg) — §2.5 extension surface.
    Q("e2_event_sessions",
      (s, d) => EventStream
        .sessionizeBatch(Tables.load(s, d, "events"), gapMinutes = 60)
        .select(col("user_id"),
          col("session_start").cast("timestamp_ntz").as("session_start"),
          col("session_end").cast("timestamp_ntz").as("session_end"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "session_start"),
      Some(sessionOracle)),

    // The engine-native face of e2: `session_window` aggregation —
    // codegen'd in batch, session-aware state store when streamed, zero
    // custom state code. Row-identical to e2 (boundary aligned, see
    // sessionizeNative) — the SECOND entry on the shared session oracle.
    Q("e2b_event_sessions_native",
      (s, d) => EventStream
        .sessionizeNative(Tables.load(s, d, "events"), gapMinutes = 60)
        .select(col("user_id"),
          col("session_start").cast("timestamp_ntz").as("session_start"),
          col("session_end").cast("timestamp_ntz").as("session_end"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "session_start"),
      Some(sessionOracle)),

    // As-of join (an operator Spark lacks; composed union + carry-
    // forward window, one shuffle). Oracle: DuckDB's NATIVE ASOF JOIN —
    // a strong independent check of the inclusive >= semantics.
    Q("e3_asof_join",
      (s, d) => {
        val e = Tables.load(s, d, "events")
          .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
        val p = e.filter(col("event_type") === "purchase")
          .groupBy("user_id", "ts").agg(max("event_id").as("mark_id"))
        graft.operators.AsofJoin(
          e.select("event_id", "user_id", "ts"), p, "user_id", "ts", Seq("mark_id"))
          .select(col("event_id"), col("user_id"),
            col("ts").cast("timestamp_ntz").as("ts"),
            col("asof_ts").cast("timestamp_ntz").as("asof_ts"),
            col("asof_mark_id"),
            (unix_millis(col("ts")) - unix_millis(col("asof_ts"))).as("ms_since"))
          .orderBy("event_id")
      },
      Some("""WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) ts, user_id, event_type FROM events),
             p AS (SELECT user_id, ts, max(event_id) AS mark_id FROM e
               WHERE event_type = 'purchase' GROUP BY user_id, ts)
             SELECT e.event_id, e.user_id, e.ts, p.ts AS asof_ts,
               p.mark_id AS asof_mark_id,
               epoch_ms(e.ts) - epoch_ms(p.ts) AS ms_since
             FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts >= p.ts
             ORDER BY event_id""")),

    // Range join (points-in-intervals) via time-binning — an equi-join
    // on the bin key instead of an O(n·m) nested-loop inequality join.
    // Intervals: each error event opens a window of `value` minutes.
    // Oracle: the plain inequality join, exact micros.
    Q("e4_range_join",
      (s, d) => {
        val ev = Tables.load(s, d, "events")
        val points = ev.select(col("event_id"), col("ts"))
        val intervals = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("w_id"), col("ts").as("start_ts"),
            expr("timestamp_micros(unix_micros(ts) + cast(floor(value * 60000) as bigint) * 1000)")
              .as("end_ts"))
        graft.operators.RangeJoin
          .pointsInIntervals(points, "event_id", "ts",
            intervals, "w_id", "start_ts", "end_ts")
          .groupBy("w_id").agg(count(lit(1)).as("n_points"))
          .orderBy("w_id")
      },
      Some("""WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) ts FROM events),
             w AS (SELECT event_id AS w_id, CAST(ts AS TIMESTAMP) AS start_ts,
               CAST(ts AS TIMESTAMP) + to_microseconds(CAST(floor(value * 60000) AS BIGINT) * 1000) AS end_ts
               FROM events WHERE event_type = 'error')
             SELECT w_id, count(*) AS n_points
             FROM e JOIN w ON e.ts >= w.start_ts AND e.ts < w.end_ts
             GROUP BY w_id ORDER BY w_id""")),

    // Stream-stream interval join (view→click attribution within 4 h),
    // run here as its batch twin — same function, watermark a no-op;
    // StreamingSpec proves the streaming execution emits the identical
    // row set. Equi-join on user_id with the time range as residual:
    // one shuffle per side, state bounded by watermark+window when
    // streamed.
    Q("e5_interval_join",
      (s, d) => {
        val e = Tables.load(s, d, "events")
        EventStream.intervalJoin(
          e.filter(col("event_type") === "view"),
          e.filter(col("event_type") === "click"), windowMinutes = 240)
          .select(col("user_id"), col("view_id"), col("click_id"),
            col("view_ts").cast("timestamp_ntz").as("view_ts"),
            col("click_ts").cast("timestamp_ntz").as("click_ts"),
            col("click_value"))
          .orderBy("view_id", "click_id")
      },
      Some(intervalJoinOracle)),

    // Skew-hardened twin of e5: shuffle keys on (user_id, salt) so a
    // power-user hot key spreads over 8 reducers; the interval predicate
    // rides as the salted equi-join's residual. Row-identical to e5 —
    // SAME oracle SQL (shared val, enforced by construction) — which is
    // the point: salting changes only the physical distribution.
    Q("e6_interval_join_salted",
      (s, d) => {
        val e = Tables.load(s, d, "events")
        EventStream.intervalJoinSalted(
          e.filter(col("event_type") === "view"),
          e.filter(col("event_type") === "click"), windowMinutes = 240,
          salts = 8)
          .select(col("user_id"), col("view_id"), col("click_id"),
            col("view_ts").cast("timestamp_ntz").as("view_ts"),
            col("click_ts").cast("timestamp_ntz").as("click_ts"),
            col("click_value"))
          .orderBy("view_id", "click_id")
      },
      Some(intervalJoinOracle)),

    // Hot-key-ONLY salted twin (VERDICT r9 #2): per-user view counts
    // pick the hot set (>= 18 views — a genuine hot/cold mix at every
    // SF); only hot users' rows scatter/replicate, the cold majority of
    // both sides flows through once. Row-identical to e5/e6 — the THIRD
    // entry on the same shared oracle — because which keys are salted
    // changes only the physical distribution.
    Q("e7_interval_join_salted_hot",
      (s, d) => {
        val e = Tables.load(s, d, "events")
        EventStream.intervalJoinSaltedHot(
          e.filter(col("event_type") === "view"),
          e.filter(col("event_type") === "click"), windowMinutes = 240,
          salts = 8, hotThreshold = 18L)
          .select(col("user_id"), col("view_id"), col("click_id"),
            col("view_ts").cast("timestamp_ntz").as("view_ts"),
            col("click_ts").cast("timestamp_ntz").as("click_ts"),
            col("click_value"))
          .orderBy("view_id", "click_id")
      },
      Some(intervalJoinOracle)),

    // Funnel analysis — the ORDER-DEPENDENT sequential conversion
    // report (signup → view → click → purchase, each step's event
    // strictly after AND within 24 h of the previous step's): the
    // product-analytics shape plain grouped counts can't express, and
    // the step window is what makes it discriminate (unbounded, every
    // user in this uniform fixture completes all four steps; at 24 h
    // the four stage counts are 150→39→16→5 at sf0.01). Each stage is
    // a conditional min per user chained through a join — four
    // user-keyed shuffles that all reuse one hash partitioning, no
    // window over the whole event log; conversion fractions are single
    // IEEE divisions of exact counts.
    Q("e8_funnel",
      (s, d) => {
        val e = Tables.load(s, d, "events")
          .select(col("user_id"), col("event_type"), col("ts"))
        def stage(prev: org.apache.spark.sql.DataFrame, tcol: String,
            typ: String, out: String) =
          e.join(prev, "user_id")
            .filter(col("event_type") === typ && col("ts") > col(tcol) &&
              col("ts") <= col(tcol) + expr("INTERVAL 24 HOURS"))
            .groupBy("user_id").agg(min("ts").as(out))
        val s1 = e.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min("ts").as("t1"))
        val s2 = stage(s1, "t1", "view", "t2")
        val s3 = stage(s2, "t2", "click", "t3")
        val s4 = stage(s3, "t3", "purchase", "t4")
        e.select("user_id").distinct()
          .join(s1.select("user_id", "t1"), Seq("user_id"), "left")
          .join(s2.select("user_id", "t2"), Seq("user_id"), "left")
          .join(s3.select("user_id", "t3"), Seq("user_id"), "left")
          .join(s4.select("user_id", "t4"), Seq("user_id"), "left")
          .agg(count(lit(1)).as("n_users"),
            count(col("t1")).as("n_signup"),
            count(col("t2")).as("n_view"),
            count(col("t3")).as("n_click"),
            count(col("t4")).as("n_purchase"))
          .select(col("n_users"), col("n_signup"), col("n_view"),
            col("n_click"), col("n_purchase"),
            (col("n_signup").cast("double") / col("n_users")).as("conv_signup"),
            (col("n_view").cast("double") / col("n_signup")).as("conv_view"),
            (col("n_click").cast("double") / col("n_view")).as("conv_click"),
            (col("n_purchase").cast("double") / col("n_click")).as("conv_purchase"))
      },
      Some("""WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) ts FROM events),
             s1 AS (SELECT user_id, min(ts) AS t1 FROM e WHERE event_type = 'signup' GROUP BY user_id),
             s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM e JOIN s1 USING (user_id)
               WHERE event_type = 'view' AND e.ts > t1 AND e.ts <= t1 + INTERVAL 24 HOUR GROUP BY e.user_id),
             s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM e JOIN s2 USING (user_id)
               WHERE event_type = 'click' AND e.ts > t2 AND e.ts <= t2 + INTERVAL 24 HOUR GROUP BY e.user_id),
             s4 AS (SELECT e.user_id, min(e.ts) AS t4 FROM e JOIN s3 USING (user_id)
               WHERE event_type = 'purchase' AND e.ts > t3 AND e.ts <= t3 + INTERVAL 24 HOUR GROUP BY e.user_id),
             lab AS (SELECT u.user_id, t1, t2, t3, t4
               FROM (SELECT DISTINCT user_id FROM e) u
               LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
               LEFT JOIN s3 USING (user_id) LEFT JOIN s4 USING (user_id))
             SELECT count(*) AS n_users, count(t1) AS n_signup,
               count(t2) AS n_view, count(t3) AS n_click,
               count(t4) AS n_purchase,
               CAST(count(t1) AS DOUBLE) / count(*) AS conv_signup,
               CAST(count(t2) AS DOUBLE) / count(t1) AS conv_view,
               CAST(count(t3) AS DOUBLE) / count(t2) AS conv_click,
               CAST(count(t4) AS DOUBLE) / count(t3) AS conv_purchase
             FROM lab""")),

    // Cohort retention — the product-analytics staple: users cohorted
    // by the ISO week of their FIRST event, retention = the fraction
    // of each cohort active again k weeks later. Week truncation is
    // Monday-aligned in both engines (Spark date_trunc('week') ≡
    // DuckDB date_trunc('week')); the offset is exact integer
    // arithmetic (day deltas between week-truncs are multiples of 7,
    // so the division is lossless before the int cast). Scale: two
    // user-keyed aggregations that reuse one hash partitioning, a
    // broadcast of the tiny (cohort, size) table, and a final
    // (cohort, offset)-keyed agg whose cardinality is weeks², not
    // events — no window over the event log anywhere.
    Q("e9_retention_cohorts",
      (s, d) => {
        // r20 (guide §2.4): cohort assignment as a window-min over the
        // distinct (user, week) activity — the old shape scanned events
        // twice (per-user min + distinct) and joined them back, paying
        // a second user_id exchange; min(wk) OVER (PARTITION BY user)
        // rides the distinct's own partitioning, and the cohort size is
        // the count of rows where wk = cohort_week (exactly one per
        // user: the min week IS an activity week). Same rows out.
        val act = Tables.load(s, d, "events")
          .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
          .distinct()
          .withColumn("cohort_week", min("wk").over(
            org.apache.spark.sql.expressions.Window.partitionBy("user_id")))
        val sizes = act.filter(col("wk") === col("cohort_week"))
          .groupBy("cohort_week").agg(count(lit(1)).as("cohort_size"))
        act
          .groupBy(col("cohort_week"),
            (datediff(col("wk"), col("cohort_week")) / lit(7))
              .cast("int").as("week_offset"))
          .agg(count(lit(1)).as("n_active"))
          .join(broadcast(sizes), Seq("cohort_week"))
          .select(col("cohort_week").cast("timestamp_ntz").as("cohort_week"),
            col("week_offset"), col("n_active"), col("cohort_size"),
            (col("n_active").cast("double") / col("cohort_size"))
              .as("retention"))
          .orderBy("cohort_week", "week_offset")
      },
      Some("""WITH e AS (SELECT user_id,
               date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk FROM events),
             f AS (SELECT user_id, min(wk) AS cohort_week FROM e GROUP BY 1),
             sz AS (SELECT cohort_week, count(*) AS cohort_size FROM f GROUP BY 1),
             a AS (SELECT DISTINCT user_id, wk FROM e),
             j AS (SELECT cohort_week,
               CAST(date_diff('day', cohort_week, wk) // 7 AS INTEGER) AS week_offset
               FROM a JOIN f USING (user_id)),
             r AS (SELECT cohort_week, week_offset, count(*) AS n_active
               FROM j GROUP BY 1, 2)
           SELECT CAST(r.cohort_week AS TIMESTAMP) AS cohort_week, week_offset,
             n_active, cohort_size,
             CAST(n_active AS DOUBLE) / cohort_size AS retention
           FROM r JOIN sz USING (cohort_week)
           ORDER BY cohort_week, week_offset""")),

    // SCD Type-2 dimension history from an event log — the warehouse
    // shape the reference's MERGE-based dims stop short of: per user,
    // consecutive events with the SAME state collapse into one
    // version row carrying [valid_from, valid_to) and is_current
    // (gaps-and-islands: change flag → running version index → one
    // group per version → lead() closes each interval). Determinism:
    // ordering ties broken by event_id everywhere. Scale: all four
    // steps are windows/aggs over ONE user-keyed partitioning — a
    // single shuffle of the event log, no self-join (the naive SCD2
    // build joins each event against the next; lead() is that join
    // for free).
    Q("e10_scd2_intervals",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val e = Tables.load(s, d, "events")
          .select(col("user_id"), col("event_id"), col("ts"),
            col("event_type").as("state"))
        val wOrd = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
        val prev = lag(col("state"), 1).over(wOrd)
        val flagged = e
          .withColumn("chg",
            when(prev.isNull || prev =!= col("state"), 1L).otherwise(0L))
          .withColumn("version_idx", sum("chg").over(
            wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val wV = Window.partitionBy("user_id").orderBy("version_idx")
        flagged.groupBy("user_id", "version_idx")
          .agg(max("state").as("state"), min("ts").as("valid_from"),
            count(lit(1)).as("n_events"))
          .withColumn("valid_to", lead(col("valid_from"), 1).over(wV))
          .select(col("user_id"), col("version_idx"), col("state"),
            col("valid_from").cast("timestamp_ntz").as("valid_from"),
            col("valid_to").cast("timestamp_ntz").as("valid_to"),
            col("n_events"),
            when(col("valid_to").isNull, 1).otherwise(0).as("is_current"))
          .orderBy("user_id", "version_idx")
      },
      Some("""WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) ts,
               event_type AS state FROM events),
             l AS (SELECT *, lag(state) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS pstate FROM e),
             f AS (SELECT *, CASE WHEN pstate IS NULL OR pstate <> state
               THEN 1 ELSE 0 END AS chg FROM l),
             v AS (SELECT *, sum(chg) OVER (PARTITION BY user_id
               ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS version_idx
               FROM f),
             g AS (SELECT user_id, version_idx, max(state) AS state,
               min(ts) AS valid_from, count(*) AS n_events
               FROM v GROUP BY 1, 2),
             o AS (SELECT *, lead(valid_from) OVER (PARTITION BY user_id
               ORDER BY version_idx) AS valid_to FROM g)
           SELECT user_id, CAST(version_idx AS BIGINT) AS version_idx, state,
             valid_from, valid_to, n_events,
             CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS is_current
           FROM o ORDER BY user_id, version_idx""")),

    // Daily-volume anomaly flags WITHOUT any transcendental: the
    // 3-sigma test |c − μ| > 3σ is algebraically equivalent to
    // (n·c − S)² > 9·(n·SS − S²) over the exact integer daily counts
    // (multiply both sides by n²), so the whole detector is BIGINT
    // arithmetic that hash-replays cross-engine — where a
    // stddev_pop-based filter would be at the mercy of each engine's
    // sqrt. Scale: one (type, day) count agg + a per-type 1-row
    // moment agg broadcast back; days×types output rows.
    Q("e11_count_anomalies",
      (s, d) => {
        val daily = Tables.load(s, d, "events")
          .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
          .agg(count(lit(1)).as("c"))
        val mom = daily.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("c").as("sv"),
            sum(col("c") * col("c")).as("ss"))
        daily.join(broadcast(mom), Seq("event_type"))
          .select(col("event_type"),
            col("day").cast("timestamp_ntz").as("day"), col("c"),
            expr("(n * c - sv) * (n * c - sv)").as("dev2"),
            expr("9 * (n * ss - sv * sv)").as("thr"),
            when(expr("(n * c - sv) * (n * c - sv) > 9 * (n * ss - sv * sv)"),
              1).otherwise(0).as("is_anomaly"))
          .orderBy("event_type", "day")
      },
      Some("""WITH daily AS (SELECT event_type,
               date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
               CAST(count(*) AS BIGINT) AS c
               FROM events GROUP BY 1, 2),
             m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(c) AS BIGINT) AS sv, CAST(sum(c * c) AS BIGINT) AS ss
               FROM daily GROUP BY 1)
           SELECT daily.event_type, day, c,
             (n * c - sv) * (n * c - sv) AS dev2,
             9 * (n * ss - sv * sv) AS thr,
             CASE WHEN (n * c - sv) * (n * c - sv) > 9 * (n * ss - sv * sv)
               THEN 1 ELSE 0 END AS is_anomaly
           FROM daily JOIN m USING (event_type)
           ORDER BY event_type, day""")),

    // Event-type transition matrix — the user-journey Markov view:
    // per user, adjacent event pairs (lag over the e10 ordering),
    // counted per (prev, next) with fixed-point row-normalized
    // probabilities (exact integer division). One user-keyed window +
    // one types²-cardinality agg; the matrix is types², independent
    // of event count.
    Q("e12_transition_matrix",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val wOrd = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
        val pairs = Tables.load(s, d, "events")
          .select(col("user_id"), col("event_id"), col("ts"),
            col("event_type").as("next_type"))
          .withColumn("prev_type", lag(col("next_type"), 1).over(wOrd))
          .filter(col("prev_type").isNotNull)
          .groupBy("prev_type", "next_type").agg(count(lit(1)).as("cnt"))
        val tot = pairs.groupBy("prev_type").agg(sum("cnt").as("tot"))
        pairs.join(broadcast(tot), Seq("prev_type"))
          .select(col("prev_type"), col("next_type"), col("cnt"),
            expr("(cnt * 1000000) div tot").as("p_e6"))
          .orderBy("prev_type", "next_type")
      },
      Some("""WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) ts,
               event_type AS next_type FROM events),
             l AS (SELECT *, lag(next_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS prev_type FROM e),
             p AS (SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS cnt
               FROM l WHERE prev_type IS NOT NULL GROUP BY 1, 2),
             t AS (SELECT prev_type, CAST(sum(cnt) AS BIGINT) AS tot
               FROM p GROUP BY 1)
           SELECT prev_type, next_type, cnt, (cnt * 1000000) // tot AS p_e6
           FROM p JOIN t USING (prev_type)
           ORDER BY prev_type, next_type""")),

    // Grouped top-k — the "top spenders per day" dashboard: exact
    // decimal per-(day, user) sums, rank window WITHIN each day (the
    // partition bounds the window: no global sort, no single-partition
    // WindowExec), top 3 per day. Output days×3 regardless of volume.
    Q("e13_daily_top_users",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.load(s, d, "events")
          .groupBy(date_trunc("day", col("ts")).as("day"), col("user_id"))
          .agg(sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("sum_value"), count(lit(1)).as("n_events"))
        val w = Window.partitionBy("day")
          .orderBy(col("sum_value").desc, col("user_id"))
        daily.withColumn("rnk", row_number().over(w).cast("int"))
          .filter(col("rnk") <= 3)
          .select(col("day").cast("timestamp_ntz").as("day"), col("rnk"),
            col("user_id"), col("sum_value"), col("n_events"))
          .orderBy("day", "rnk")
      },
      Some("""WITH daily AS (SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
               user_id,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
               count(*) AS n_events
               FROM events GROUP BY 1, 2),
             r AS (SELECT *, row_number() OVER (PARTITION BY day
               ORDER BY sum_value DESC, user_id) AS rnk FROM daily)
           SELECT day, CAST(rnk AS INTEGER) AS rnk, user_id, sum_value,
             n_events
           FROM r WHERE rnk <= 3 ORDER BY day, rnk""")),

    // DAU / rolling-7-day WAU / stickiness — the engagement dashboard.
    // A windowed COUNT DISTINCT doesn't exist, and a days×activity
    // range join would plan a nested loop; instead each (day, user)
    // activity row EXPLODES into the ≤7 future report days it
    // contributes to (sequence over timestamps), is deduped per
    // (report day, user), and counted — plain hash aggregation at
    // every step, 7× the activity rows at worst. Report days are
    // restricted to days that actually have events (both engines).
    // Stickiness is exact fixed point.
    Q("e14_rolling_active",
      (s, d) => {
        val da = Tables.load(s, d, "events")
          .select(date_trunc("day", col("ts")).as("day"), col("user_id"))
          .distinct()
        val days = da.select(col("day")).distinct()
        val dau = da.groupBy("day").agg(count(lit(1)).as("dau"))
        val wau = da.select(col("user_id"),
            explode(expr("sequence(day, day + INTERVAL 6 DAYS, INTERVAL 1 DAY)"))
              .as("day"))
          .distinct()
          .join(days, Seq("day"))
          .groupBy("day").agg(count(lit(1)).as("wau"))
        dau.join(wau, Seq("day"))
          .select(col("day").cast("timestamp_ntz").as("day"),
            col("dau"), col("wau"),
            expr("(dau * 1000000) div wau").as("stickiness_e6"))
          .orderBy("day")
      },
      Some("""WITH da AS (SELECT DISTINCT
               date_trunc('day', CAST(ts AS TIMESTAMP)) AS day, user_id
               FROM events),
             days AS (SELECT DISTINCT day FROM da),
             dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau
               FROM da GROUP BY 1),
             sp AS (SELECT DISTINCT user_id, unnest(generate_series(
               day, day + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS day FROM da),
             wau AS (SELECT sp.day, CAST(count(*) AS BIGINT) AS wau
               FROM sp JOIN days USING (day) GROUP BY 1)
           SELECT day, dau, wau, (dau * 1000000) // wau AS stickiness_e6
           FROM dau JOIN wau USING (day) ORDER BY day""")),

    // Time-weighted average value per user — the IoT/metrics estimator
    // (each reading weighted by how long it was current): value →
    // exact integer cents (round(v·100) — the column is 2-decimal by
    // construction), interval → exact integer microseconds via
    // lead(), so numerator and denominator are BIGINT sums
    // (order-independent) and the final twa is two deterministic IEEE
    // divisions. Headroom: cents ≤ 10⁴ × a month of µs ≈ 2.6e16 ≪ 2^53,
    // so even the double casts are exact. Users with a single event
    // have no current-interval and are excluded (documented contract).
    Q("e15_time_weighted_avg",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        Tables.load(s, d, "events")
          .select(col("user_id"), col("event_id"), col("ts"),
            expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
          .withColumn("next_ts", lead(col("ts"), 1).over(w))
          .filter(col("next_ts").isNotNull)
          .withColumn("dur_us",
            expr("unix_micros(next_ts) - unix_micros(ts)"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_intervals"),
            sum("dur_us").as("total_us"),
            sum(expr("cents * dur_us")).as("num"))
          .select(col("user_id"), col("n_intervals"), col("total_us"),
            (col("num").cast("double") / col("total_us").cast("double") /
              lit(100.0)).as("twa"))
          .orderBy("user_id")
      },
      Some("""WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) ts,
               CAST(round(value * 100) AS BIGINT) AS cents FROM events),
             l AS (SELECT *, lead(ts) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS next_ts FROM e),
             iv AS (SELECT user_id, cents,
               epoch_us(next_ts) - epoch_us(ts) AS dur_us
               FROM l WHERE next_ts IS NOT NULL),
             g AS (SELECT user_id, count(*) AS n_intervals,
               CAST(sum(dur_us) AS BIGINT) AS total_us,
               CAST(sum(cents * dur_us) AS BIGINT) AS num
               FROM iv GROUP BY 1)
           SELECT user_id, n_intervals, total_us,
             CAST(num AS DOUBLE) / CAST(total_us AS DOUBLE) / 100.0 AS twa
           FROM g ORDER BY user_id""")),

    // Co-occurrence mining (the market-basket shape): which event-type
    // PAIRS happen inside the same (user, day) basket, with support
    // and the fixed-point lift surrogate
    // lift_e6 = (n_both · n_baskets · 1e6) div (n_a · n_b) — all
    // exact integers. Baskets and per-type distincts reuse ONE
    // (user, day)-keyed dedup; the pair join explodes ≤ types² per
    // basket — bounded by the type-dimension, not event volume.
    Q("e16_cooccurrence",
      (s, d) => {
        val b = Tables.load(s, d, "events")
          .select(col("user_id"), date_trunc("day", col("ts")).as("day"),
            col("event_type"))
          .distinct()
        val nb = b.select("user_id", "day").distinct()
          .agg(count(lit(1)).as("nb"))
        val per = b.groupBy("event_type").agg(count(lit(1)).as("n_t"))
        val pairs = b.as("x").join(b.as("y"),
            col("x.user_id") === col("y.user_id") &&
              col("x.day") === col("y.day") &&
              col("x.event_type") < col("y.event_type"))
          .groupBy(col("x.event_type").as("t1"), col("y.event_type").as("t2"))
          .agg(count(lit(1)).as("n_both"))
        pairs
          .join(broadcast(per.select(col("event_type").as("t1"),
            col("n_t").as("n_1"))), Seq("t1"))
          .join(broadcast(per.select(col("event_type").as("t2"),
            col("n_t").as("n_2"))), Seq("t2"))
          .crossJoin(broadcast(nb))
          .select(col("t1"), col("t2"), col("n_both"), col("n_1"), col("n_2"),
            // 128-bit numerator/denominator: n_both·nb·1e6 overflows
            // BIGINT once n_both·nb > ~9.2e12 — plausible at the 100 TB
            // target where nb = distinct (user, day) baskets. DECIMAL(38)
            // here and HUGEINT in the oracle keep the value exact and
            // identical to the 64-bit form, with ~1e38 headroom.
            expr("CAST((CAST(n_both AS DECIMAL(38,0)) * nb * 1000000)" +
              " div (CAST(n_1 AS DECIMAL(38,0)) * n_2) AS BIGINT)")
              .as("lift_e6"))
          .orderBy("t1", "t2")
      },
      Some("""WITH b AS (SELECT DISTINCT user_id,
               date_trunc('day', CAST(ts AS TIMESTAMP)) AS day, event_type
               FROM events),
             nb AS (SELECT count(*) AS n FROM
               (SELECT DISTINCT user_id, day FROM b)),
             per AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_t
               FROM b GROUP BY 1),
             p AS (SELECT x.event_type AS t1, y.event_type AS t2,
               CAST(count(*) AS BIGINT) AS n_both
               FROM b x JOIN b y ON x.user_id = y.user_id AND x.day = y.day
                 AND x.event_type < y.event_type
               GROUP BY 1, 2)
           SELECT t1, t2, n_both, a.n_t AS n_1, c.n_t AS n_2,
             CAST((CAST(n_both AS HUGEINT) * nb.n * 1000000)
               // (CAST(a.n_t AS HUGEINT) * c.n_t) AS BIGINT) AS lift_e6
           FROM p JOIN per a ON a.event_type = p.t1
             JOIN per c ON c.event_type = p.t2
             CROSS JOIN nb
           ORDER BY t1, t2""")),

    // Inter-event latency distribution — per event type, the log2
    // histogram of microsecond gaps between a user's consecutive
    // events of that type (t14's engine-portable bucket rule:
    // bucket = bit-length − 1, no log()). The latency-dashboard shape
    // at fixed sketch size: state is types × ≤64 buckets whatever the
    // event volume.
    Q("e17_gap_histogram",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("event_type", "user_id")
          .orderBy(col("ts"), col("event_id"))
        val gaps = Tables.load(s, d, "events")
          .select(col("event_type"), col("user_id"), col("event_id"), col("ts"))
          .withColumn("prev_ts", lag(col("ts"), 1).over(w))
          .filter(col("prev_ts").isNotNull)
          .selectExpr("event_type AS g",
            "unix_micros(ts) - unix_micros(prev_ts) AS v")
        graft.operators.Sketches.logHistogramBy(gaps, Seq("g"))
          .orderBy("g", "bucket")
      },
      Some("""WITH e AS (SELECT event_type AS g, user_id, event_id,
               CAST(ts AS TIMESTAMP) ts FROM events),
             l AS (SELECT *, lag(ts) OVER (PARTITION BY g, user_id
               ORDER BY ts, event_id) AS prev_ts FROM e),
             v AS (SELECT g, epoch_us(ts) - epoch_us(prev_ts) AS v
               FROM l WHERE prev_ts IS NOT NULL),
             b AS (SELECT g, CASE WHEN v <= 0 THEN -1
               ELSE CAST(length(bin(v)) - 1 AS INTEGER) END AS bucket FROM v)
           SELECT g, bucket, CAST(count(*) AS BIGINT) AS cnt
           FROM b GROUP BY 1, 2 ORDER BY g, bucket""")),

    // Exponentially-decayed lifetime value WITHOUT floats: a one-day
    // half-life decay is exactly `cents div 2^age_days` (each elapsed
    // day halves the contribution — integer division by a shifted
    // power of two, no pow/exp), so the whole decayed-LTV ranking is
    // BIGINT arithmetic that hash-replays cross-engine. `div` is used
    // rather than `shiftright` deliberately: Spark's shiftright is an
    // arithmetic (flooring) shift while DuckDB's `//` truncates toward
    // zero, so negative cents (refunds/adjustments) would diverge
    // under a shift; truncating division matches `//` for all signs.
    // Age is measured against the corpus
    // max timestamp (one-row broadcast scalar). The recency-weighted
    // user-value dashboard; contributions older than 63 days shift
    // to exactly 0.
    Q("e18_decayed_ltv",
      (s, d) => {
        val e = Tables.load(s, d, "events")
          .select(col("user_id"), col("ts"),
            expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
        val mx = e.agg(max(date_trunc("day", col("ts"))).as("max_day"))
        e.crossJoin(broadcast(mx))
          .select(col("user_id"),
            expr("CAST(datediff(max_day, date_trunc('day', ts)) AS INT)")
              .as("age"),
            col("cents"))
          .select(col("user_id"),
            expr("CASE WHEN age >= 63 THEN 0L ELSE cents div shiftleft(1L, age) END")
              .as("dc"), col("cents"))
          .groupBy("user_id")
          .agg(sum("dc").as("decayed_cents"),
            sum("cents").as("total_cents"), count(lit(1)).as("n_events"))
          .orderBy("user_id")
      },
      Some("""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) ts,
               CAST(round(value * 100) AS BIGINT) AS cents FROM events),
             m AS (SELECT max(date_trunc('day', ts)) AS max_day FROM e),
             a AS (SELECT user_id,
               CAST(date_diff('day', date_trunc('day', ts), max_day) AS INTEGER) AS age,
               cents FROM e CROSS JOIN m),
             dcv AS (SELECT user_id,
               CASE WHEN age >= 63 THEN 0 ELSE cents // (CAST(1 AS BIGINT) << age) END AS dc,
               cents FROM a)
           SELECT user_id, CAST(sum(dc) AS BIGINT) AS decayed_cents,
             CAST(sum(cents) AS BIGINT) AS total_cents,
             count(*) AS n_events
           FROM dcv GROUP BY 1 ORDER BY user_id""")),

    // Last-touch attribution with a BOUNDED look-back — the marketing
    // question e3's unbounded as-of can't answer alone: a purchase is
    // ATTRIBUTED to a click only if the user's latest preceding click
    // falls within 3 days; otherwise organic. Rides the AsofJoin
    // operator (one user-keyed shuffle, union + running `last` — no
    // inequality join), then classifies by exact millisecond
    // arithmetic and folds to a per-day report. At 100 TB this is the
    // same single user-partitioning every e-family entry rides; the
    // window bound is a filter, not a join condition.
    Q("e19_last_touch_attribution",
      (s, d) => {
        val e = Tables.load(s, d, "events")
        val p = e.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val c = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts")).distinct()
        graft.operators.AsofJoin(p, c, "user_id", "ts", Seq())
          .select(col("event_id"), date_trunc("day", col("ts")).as("day"),
            (col("asof_ts").isNotNull &&
              (unix_millis(col("ts")) - unix_millis(col("asof_ts"))
                <= lit(259200000L))).as("attributed"))
          .groupBy(col("day").cast("timestamp_ntz").as("day"))
          .agg(count(lit(1)).as("n_purchases"),
            sum(when(col("attributed"), 1L).otherwise(0L)).as("n_attributed"),
            sum(when(col("attributed"), 0L).otherwise(1L)).as("n_organic"))
          .orderBy("day")
      },
      Some("""WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) ts, user_id, event_type FROM events),
             p AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'purchase'),
             c AS (SELECT DISTINCT user_id, ts FROM e WHERE event_type = 'click'),
             j AS (SELECT p.event_id, p.ts, c.ts AS click_ts
               FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts),
             cls AS (SELECT date_trunc('day', ts) AS day,
               (click_ts IS NOT NULL AND
                epoch_ms(ts) - epoch_ms(click_ts) <= 259200000) AS attributed
               FROM j)
           SELECT day, count(*) AS n_purchases,
             CAST(sum(CASE WHEN attributed THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
             CAST(sum(CASE WHEN attributed THEN 0 ELSE 1 END) AS BIGINT) AS n_organic
           FROM cls GROUP BY 1 ORDER BY day"""))
  )
}
