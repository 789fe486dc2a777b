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
  def unloadDocs(spark: SparkSession, sfDir: String): DataFrame = {
    val t = CitibikeSource.trips(spark, sfDir)
    val ss = CitibikeSource.stations(spark, sfDir)
    val es = ss
    val p = CitibikeSource.programs(spark, sfDir)
    t.join(broadcast(ss.as("ss")), col("start_station_id") === col("ss.station_id"))
      .join(broadcast(es.as("es")), col("end_station_id") === col("es.station_id"))
      .join(broadcast(p.as("p")), Seq("program_id"))
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
  }

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
    // dp_setup.sql:45-51 — distinct partition values, ordered.
    val days = inRange.select("day").distinct().orderBy("day")
      .collect().map(_.getString(0))

    val fs = FileSystem.get(new Path(stageDir).toUri, spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(stageDir))
    var counter = 0
    for (day <- days) {
      val tmp = s"$stageDir/.unload_tmp_$day"
      inRange.filter(col("day") === day)
        .orderBy("starttime", "doc") // dp_setup.sql:81 `order by starttime`
        .select("doc")
        .coalesce(filesPerDay)
        .write.mode("overwrite").text(tmp)
      // move part files to the stage root as snowpipe_demo<day>_<i>.json
      // (the reference's `@stage/snowpipe_demo<day>` naming).
      val parts = fs.listStatus(new Path(tmp))
        .filter(_.getPath.getName.startsWith("part-")).sortBy(_.getPath.getName)
      parts.zipWithIndex.foreach { case (st, i) =>
        fs.rename(st.getPath, new Path(s"$stageDir/snowpipe_demo${day}_$i.json"))
      }
      fs.delete(new Path(tmp), true)
      counter += 1
      if (sleepMs > 0) Thread.sleep(sleepMs)
    }
    counter
  }
}
