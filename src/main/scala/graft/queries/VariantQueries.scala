package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** §2's semi-structured surface: the reference's raw table is a single
  * VARIANT column (dp_setup.sql:140) shredded by `v:field::type` casts
  * (dp_setup.sql:193-202) and built by `object_construct`
  * (dp_setup.sql:58-75). Exercised here over `events.props` (JSON string).
  *
  * Spark-first choice: Spark 4's native VariantType (`parse_json` +
  * `try_variant_get`) — schema-on-read like Snowflake VARIANT, binary
  * encoded, codegen'd path extraction. At 100 TB the shredding cast is a
  * narrow per-row map with no shuffle.
  */
object VariantQueries extends QueryPack {

  val queries: Seq[Q] = Seq(

    // P3: variant path extraction + cast-down, the reference's
    // `v:k::number` (dp_setup.sql:193, dp_demo.sql:132). try_parse_json +
    // try_variant_get return NULL on malformed input (never throw) — the
    // same totality as Snowflake's TRY semantics our pipeline needs.
    Q("p3_variant_get",
      (s, d) => Tables.load(s, d, "events")
        .select(
          col("event_id"),
          try_variant_get(try_parse_json(col("props")), "$.k", "int").as("k"))
        .orderBy("event_id"),
      Some("""SELECT event_id, CAST(props->>'$.k' AS INTEGER) AS k
             FROM events ORDER BY event_id""")),

    // Variant-shred + typed filter + aggregate: the push_trips shape
    // (dp_setup.sql:192-203) — shred, cast, then relational ops on top.
    Q("v2_shred_agg",
      (s, d) => Tables.load(s, d, "events")
        .select(
          col("event_type"),
          try_variant_get(try_parse_json(col("props")), "$.k", "int").as("k"))
        .filter(col("k") >= 50)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k").cast("long")).as("sum_k"))
        .orderBy("event_type"),
      Some("""SELECT event_type, count(*) AS n,
             CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k
             FROM events WHERE CAST(props->>'$.k' AS INTEGER) >= 50
             GROUP BY 1 ORDER BY event_type""")),

    // S7's object_construct → JSON document (dp_setup.sql:58-75):
    // to_json(named_struct(...)). Key order is the struct field order in
    // both engines; ints stay ints, so the JSON text is byte-identical.
    Q("v3_object_construct",
      (s, d) => Tables.load(s, d, "nation")
        .select(
          col("n_nationkey"),
          to_json(struct(
            col("n_nationkey").as("nationkey"),
            col("n_name").as("name"),
            col("n_regionkey").as("regionkey"))).as("doc"))
        .orderBy("n_nationkey"),
      Some("""SELECT n_nationkey,
             '{"nationkey":' || n_nationkey || ',"name":"' || n_name || '","regionkey":' || n_regionkey || '}' AS doc
             FROM nation ORDER BY n_nationkey"""))
  )
}
