package graft.queries

import org.apache.spark.sql.functions._

import graft.pipeline.{CitibikeSource, Producer, Transform}

/** Batch-expressible slices of the streaming pipeline (SURVEY §2.10,
  * §3.1-3.2), oracle-checked. The streaming-only semantics (exactly-once
  * file ingest, checkpointing, purge, metrics) are covered end-to-end by
  * PipelineSpec; these entries pin the *dataflow* the pipeline executes:
  * the producer's 17-field document construction and the shred back to
  * typed columns.
  */
object PipelineQueries extends QueryPack {

  val queries: Seq[Q] = Seq(

    // The full producer→pipe→push_trips dataflow as one batch plan:
    // 3-join (dims broadcast) → object_construct (dp_setup.sql:58-75) →
    // parse_json → the ten v:field::type casts (dp_setup.sql:193-202).
    // The oracle computes the same columns directly — proving the JSON
    // round trip is lossless for every type (int, string, double,
    // timestamp_ntz).
    // Scale/efficiency note: the deterministic total order the oracle
    // hash needs is applied on the cheap source key BELOW the whole
    // to_json→parse→extract chain (Producer.unloadDocsOrdered): the
    // range-boundary sampling then scans only the typed source columns
    // and the ONE range exchange carries typed rows, not built JSON —
    // vs `unloadDocs.orderBy(doc_key)`, which paid a round-robin
    // exchange + a sampling re-execution of the to_json chain + a
    // second exchange of the JSON strings (r20 plan diff: 2 Exchanges
    // → 1). bikeid is unique, so the output order is identical.
    Q("pipe_shred_roundtrip",
      (s, d) => Transform.shredTrips(
        Producer.unloadDocsOrdered(s, d).select(col("doc").as("v"))),
      Some(s"""SELECT * FROM (${CitibikeSource.tripsOracleSql}) ORDER BY bikeid""")),

    // The same roundtrip through the schema-known fast shred
    // (Transform.shredTripsFast: one from_json into the pinned 10-field
    // struct instead of ten variant path extractions). Same oracle ⇒ the
    // fast path is continuously proven equal, and the bench keeps the
    // slow/fast ratio visible per round (~3× measured at sf0.1).
    Q("pipe_shred_fast",
      (s, d) => Transform.shredTripsFast(
        Producer.unloadDocsOrdered(s, d).select(col("doc").as("v"))),
      Some(s"""SELECT * FROM (${CitibikeSource.tripsOracleSql}) ORDER BY bikeid""")),

    // The demo's golden-count methodology (dp_demo.sql:150-162,196-198)
    // as an oracle-checked dashboard over a fixed ingest window: row
    // counts the pipeline must land for 1995-01. Scalar subqueries, each
    // an independent pruned aggregate (Q1 shape).
    Q("pipe_golden_counts",
      (s, d) => {
        val w = CitibikeSource.trips(s, d)
          .filter(to_date(col("starttime")).between("1995-01-01", "1995-01-31"))
        val stations = w.select(col("start_station_id").as("id"))
          .union(w.select(col("end_station_id").as("id")))
        w.agg(
          count(lit(1)).as("trips_modelled"),
          countDistinct(col("program_id")).as("num_programs"),
          max(col("starttime")).as("max_date"))
          .crossJoin(stations.agg(countDistinct(col("id")).as("num_stations")))
          .select("trips_modelled", "num_programs", "num_stations", "max_date")
      },
      Some(s"""WITH w AS (
           SELECT * FROM (${CitibikeSource.tripsOracleSql})
           WHERE CAST(starttime AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1995-01-31')
         SELECT (SELECT count(*) FROM w) AS trips_modelled,
                (SELECT count(DISTINCT program_id) FROM w) AS num_programs,
                (SELECT count(DISTINCT id) FROM
                  (SELECT start_station_id AS id FROM w
                   UNION ALL SELECT end_station_id FROM w)) AS num_stations,
                (SELECT max(starttime) FROM w) AS max_date"""))
  )
}
