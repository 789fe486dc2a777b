package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

/** Event-time streaming parity: the SAME transforms run (a) as batch
  * plans (oracle-checked via e1/e2) and (b) under a streaming file
  * source with Trigger.AvailableNow — results must agree.
  */
class StreamingSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Stage the events parquet into a temp dir (a streaming source needs
    * a directory it can list).
    */
  private lazy val eventsDir: String = {
    val dir = Files.createTempDirectory("graft_events").toString
    Files.copy(Paths.get(s"$sf/events.parquet"),
      Paths.get(dir, "events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir
  }

  test("windowed agg with watermark: streaming result equals the batch plan") {
    val q = EventStream.windowedAgg(EventStream.readEvents(spark, eventsDir))
      .writeStream.format("memory").queryName("win_agg")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("win_agg")
      .select("window_start", "event_type", "n", "sum_value").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = EventStream.windowedAgg(Tables.load(spark, sf, "events"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("flatMapGroupsWithState sessionization equals batch window-function sessions") {
    val q = EventStream
      .sessionize(spark, EventStream.readEvents(spark, eventsDir), gapMinutes = 60)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // parity INCLUDES sum_value: the stateful path accumulates exact
    // DECIMAL(18,2) like the batch plan, so the doubles are bit-identical
    val streamed = spark.table("sessions")
      .select("user_id", "session_start", "session_end", "n_events", "sum_value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4))).toSet

    val all = EventStream.sessionizeBatch(Tables.load(spark, sf, "events"), 60)
    // the stateful path emits sessions only once CLOSED; each user's
    // final session is still open when the stream drains.
    val lastPerUser = all.groupBy("user_id")
      .agg(max("session_start").as("session_start"))
    val expected = all.join(lastPerUser,
        Seq("user_id", "session_start"), "left_anti")
      .select("user_id", "session_start", "session_end", "n_events", "sum_value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(streamed === expected)
    assert(streamed.nonEmpty)
  }

  test("streaming dedup drops replayed events within the watermark") {
    // an at-least-once upstream: the same file delivered twice
    val dupDir = Files.createTempDirectory("graft_events_dup").toString
    Files.copy(Paths.get(s"$sf/events.parquet"),
      Paths.get(dupDir, "events_a.parquet"), StandardCopyOption.REPLACE_EXISTING)
    Files.copy(Paths.get(s"$sf/events.parquet"),
      Paths.get(dupDir, "events_b.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val q = EventStream.dedupStream(EventStream.readEvents(spark, dupDir))
      .writeStream.format("memory").queryName("dedup_events")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("dedup_events")
    val source = Tables.load(spark, sf, "events")
    // every id exactly once, none lost — same set as the batch twin
    assert(streamed.count() === source.select("event_id").distinct().count())
    assert(streamed.groupBy("event_id").count()
      .filter(col("count") > 1).count() === 0)
    assert(streamed.select("event_id").exceptAll(
      EventStream.dedupBatch(source).select("event_id")).count() === 0)
  }
}
