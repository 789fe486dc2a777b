package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's producer simulator `stream_data(start, stop)`
  * (dp_setup.sql:37-93): trickle-unloads the source trips, one JSON-lines
  * file set per day, into the stage directory.
  *
  * Faithful shape: the day list is enumerated driver-side (the proc's
  * cursor loop, dp_setup.sql:45-56 — bounded by the requested date range,
  * never by data volume, so driver memory is safe at any scale), and each
  * day is one `COPY INTO @stage/snowpipe_demo<day> FROM (select
  * object_construct(<17 fields>) ... order by starttime)`
  * (dp_setup.sql:57-81). Date args use the reference's `MM/dd/yyyy`
  * format (dp_demo.sql:115) — parsed explicitly, since Spark does not
  * auto-detect it (SURVEY §7.4 #4).
  *
  * Scale note: each day's unload is a distributed job (join + to_json run
  * on executors); only the file rename is driver-side. The reference
  * emits one file set per day; `filesPerDay` controls output parallelism
  * for larger days.
  */
object Producer {

  /** The 17-field `object_construct` unload document (dp_setup.sql:58-75):
    * trips ⋈ stations ss ⋈ stations es ⋈ programs p — dims broadcast
    * (they are supplier/nation-sized; at 100 TB of trips the dims are
    * still tiny, so no fact shuffle).
    */
  def unloadDocs(spark: SparkSession, sfDir: String): DataFrame =
    unloadDocsFrom(joinedTrips(spark, sfDir)
      // spread before the 17-field JSON serialization: the broadcast
      // joins preserve the scan's partitioning, and the testdata's
      // single-row-group file is unsplittable, so without this the
      // to_json (and any shred stacked on top) runs on ONE core —
      // measured ~2× both pipe_shred entries at sf0.1. A production
      // multi-file layout gets this parallelism from the scan itself.
      .repartition(spark.sparkContext.defaultParallelism))

  /** `unloadDocs` with the rows in GLOBAL `doc_key` (= bikeid, unique)
    * order — the deterministic-order face the pipe_shred entries
    * consume. The sort runs on the NARROW TYPED columns BELOW the
    * 17-field JSON serialization: a global sort stacked on top of
    * `unloadDocs` pays twice (range-boundary sampling re-executes the
    * join + to_json chain, then the range exchange ships the built
    * JSON strings — measured 2 Exchanges + a sampled to_json pass);
    * here the sampling scans only the source key and the one range
    * exchange carries typed columns, with the to_json → parse chain
    * running AFTER the sort, in the sort's own 32-way partitioning
    * (which also replaces the round-robin spread — one exchange total).
    * Projections preserve order, and bikeid is unique, so the output
    * row order is identical to `unloadDocs.orderBy("doc_key")`.
    */
  def unloadDocsOrdered(spark: SparkSession, sfDir: String): DataFrame =
    unloadDocsFrom(joinedTrips(spark, sfDir).orderBy(col("bikeid")))

  private def joinedTrips(spark: SparkSession, sfDir: String): DataFrame = {
    val t = CitibikeSource.trips(spark, sfDir)
    val ss = CitibikeSource.stations(spark, sfDir)
    val es = ss
    val p = CitibikeSource.programs(spark, sfDir)
    t.join(broadcast(ss.as("ss")), col("start_station_id") === col("ss.station_id"))
      .join(broadcast(es.as("es")), col("end_station_id") === col("es.station_id"))
      .join(broadcast(p.as("p")), Seq("program_id"))
  }

  private def unloadDocsFrom(joined: DataFrame): DataFrame =
    joined
      .select(
        col("starttime"),
        col("bikeid").as("doc_key"),
        to_json(struct(
          col("tripduration"),
          col("starttime"),
          col("stoptime"),
          col("start_station_id"),
          col("ss.station_name").as("start_station_name"),
          col("ss.station_latitude").as("start_station_latitude"),
          col("ss.station_longitude").as("start_station_longitude"),
          col("end_station_id"),
          col("es.station_name").as("end_station_name"),
          col("es.station_latitude").as("end_station_latitude"),
          col("es.station_longitude").as("end_station_longitude"),
          col("bikeid"),
          col("usertype"),
          col("birth_year"),
          col("gender"),
          col("program_id"),
          col("p.program_name").as("program_name"))).as("doc"))

  /** Unload one JSON-lines file set per day into `stageDir`; returns the
    * number of day files written (the proc's `counter` return value).
    * `sleepMs` paces the drops like the proc's busy-wait
    * (dp_setup.sql:86-90); tests pass 0.
    */
  def streamData(
      spark: SparkSession,
      sfDir: String,
      stageDir: String,
      startDate: String,
      stopDate: String,
      sleepMs: Long = 0L,
      filesPerDay: Int = 1): Int = {
    val docs = unloadDocs(spark, sfDir)
      .withColumn("day", date_format(col("starttime"), "yyyy-MM-dd"))
    val inRange = docs.filter(
      to_date(col("starttime")) >= to_date(lit(startDate), "MM/dd/yyyy") &&
      to_date(col("starttime")) <= to_date(lit(stopDate), "MM/dd/yyyy"))
    val fs = FileSystem.get(new Path(stageDir).toUri, spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(stageDir))
    // ONE partitioned write instead of one job per day: the 3-join unload
    // plan used to re-execute per loop iteration (r2 advice #3); a
    // `partitionBy("day")` write scans the source exactly once at any
    // range length. Rows are routed so each day lands in `filesPerDay`
    // tasks and sorted by starttime within each file (dp_setup.sql:81 —
    // with filesPerDay=1 this is the reference's one ordered file per
    // day). Files are then renamed into the stage per day, paced by
    // `sleepMs`, preserving the proc's observable trickle
    // (dp_setup.sql:86-90).
    val tmp = new Path(s"$stageDir/.unload_tmp")
    inRange
      // day leads the within-partition sort: repartition can put several
      // days in one task, and partitionBy's writer needs rows grouped by
      // day — with day already leading, the writer inserts no re-sort,
      // and within-file starttime order is guaranteed by THIS sort
      // rather than by the re-sort happening to be stable (round-3
      // advice: TimSort stability is an implementation detail).
      .repartition(col("day"), pmod(xxhash64(col("doc")), lit(filesPerDay)))
      .sortWithinPartitions("day", "starttime", "doc")
      .select("day", "doc")
      .write.mode("overwrite").partitionBy("day").text(tmp.toString)
    val dayDirs =
      if (fs.exists(tmp))
        fs.listStatus(tmp).filter(_.getPath.getName.startsWith("day="))
          .sortBy(_.getPath.getName)
      else Array.empty[org.apache.hadoop.fs.FileStatus]
    var counter = 0
    for (dir <- dayDirs) {
      val day = dir.getPath.getName.stripPrefix("day=")
      val parts = fs.listStatus(dir.getPath)
        .filter(_.getPath.getName.startsWith("part-")).sortBy(_.getPath.getName)
      parts.zipWithIndex.foreach { case (st, i) =>
        val dst = new Path(s"$stageDir/snowpipe_demo${day}_$i.json")
        // re-running a range overwrites that day's files (the reference's
        // COPY INTO overwrite); a plain rename onto an existing target
        // fails SILENTLY and would drop the fresh data.
        if (fs.exists(dst)) fs.delete(dst, false)
        fs.rename(st.getPath, dst)
      }
      counter += 1
      if (sleepMs > 0) Thread.sleep(sleepMs)
    }
    fs.delete(tmp, true)
    counter
  }
}
