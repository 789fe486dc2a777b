package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.streaming.EventStream

/** Event-time analytics over the `events` table — the batch faces of the
  * streaming transforms in graft.streaming (same code paths; the
  * streaming execution is checked for parity in StreamingSpec).
  */
object EventQueries extends QueryPack {

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
      Some("""WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) ts, user_id, value FROM events),
             l AS (SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) prev_ts FROM e),
             f AS (SELECT *, CASE WHEN prev_ts IS NULL OR epoch_ms(ts) - epoch_ms(prev_ts) > 3600000 THEN 1 ELSE 0 END AS new_session FROM l),
             s AS (SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) session_idx FROM f)
             SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             FROM s GROUP BY user_id, session_idx ORDER BY user_id, session_start"""))
  )
}
