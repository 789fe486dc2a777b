package graft.pipeline

import java.sql.Timestamp

/** Injectable clock so operational-metadata queries (`task_history`,
  * `copy_history` look-backs, `current_timestamp`/`current_time` parity —
  * reference dp_demo.sql:128,167) stay deterministic under test.
  */
trait Clock extends Serializable {
  def now(): Timestamp
  /** Snowflake `current_time()` analogue (dp_demo.sql:167). */
  def currentTime(): String =
    new java.text.SimpleDateFormat("HH:mm:ss").format(now())
}

object SystemClock extends Clock {
  def now(): Timestamp = new Timestamp(System.currentTimeMillis())
}

/** Fixed, manually-advanced clock for tests. */
final class ManualClock(var millis: Long) extends Clock {
  def now(): Timestamp = new Timestamp(millis)
  def advance(ms: Long): Unit = millis += ms
}
