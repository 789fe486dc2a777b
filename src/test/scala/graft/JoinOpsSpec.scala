package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsofJoin, RangeJoin}

class JoinOpsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof join: inclusive ties, carry-forward, and null before first mark") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00")), // before any mark -> null
      (2L, 10L, ts("2024-01-01 01:00:00")), // == mark A -> A (inclusive)
      (3L, 10L, ts("2024-01-01 02:30:00")), // between A and B -> A
      (4L, 10L, ts("2024-01-01 04:00:00")), // after B -> B
      (5L, 99L, ts("2024-01-01 05:00:00"))  // key with no marks -> null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 01:00:00"), "A"),
      (10L, ts("2024-01-01 03:00:00"), "B")
    ).toDF("user_id", "ts", "mark")
    val out = AsofJoin(left, right, "user_id", "ts", Seq("mark"))
      .select("event_id", "asof_mark").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out === Map(1L -> None, 2L -> Some("A"), 3L -> Some("A"),
      4L -> Some("B"), 5L -> None))
  }

  test("range join: boundary semantics [start, end) and empty-interval safety") {
    val points = Seq(
      (1L, ts("2024-01-01 00:00:00")),
      (2L, ts("2024-01-01 00:30:00")),
      (3L, ts("2024-01-01 01:00:00"))  // == end -> excluded
    ).toDF("pid", "pts")
    val intervals = Seq(
      (100L, ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00")),
      (200L, ts("2024-01-01 00:30:00"), ts("2024-01-01 00:30:00")) // empty
    ).toDF("iid", "s", "e")
    val out = RangeJoin.pointsInIntervals(points, "pid", "pts", intervals, "iid", "s", "e")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((100L, 1L), (100L, 2L)))
  }

  test("range join: the bin-width hint never changes the result") {
    // random-ish points and variable-length intervals; every bin width —
    // far smaller and far larger than any interval — must produce the
    // same pair set (bins shape candidates only; the exact recheck is
    // the semantics)
    val points = (0 until 500)
      .map(i => (i.toLong, java.sql.Timestamp.valueOf(
        ts("2024-01-01 00:00:00").toLocalDateTime.plusSeconds(i * 97L))))
      .toDF("pid", "pts")
    val intervals = (0 until 60).map { i =>
      val s = ts("2024-01-01 00:00:00").toLocalDateTime.plusSeconds(i * 700L)
      (1000L + i, java.sql.Timestamp.valueOf(s),
        java.sql.Timestamp.valueOf(s.plusSeconds(60L + (i % 7) * 400L)))
    }.toDF("iid", "s", "e")
    def pairs(hint: Long) = RangeJoin
      .pointsInIntervals(points, "pid", "pts", intervals, "iid", "s", "e",
        binHintUs = hint)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ref = pairs(0L)
    assert(ref.nonEmpty)
    Seq(1000000L, 60000000L, 3600000000L, Long.MaxValue / 4).foreach { h =>
      assert(pairs(h) === ref, s"bin hint $h changed the result")
    }
  }
}
