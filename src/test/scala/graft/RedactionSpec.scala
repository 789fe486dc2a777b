package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Redaction

/** Semantics of the PII scrub on REALISTIC planted strings — the
  * t5_redact_pii oracle proves cross-engine hash identity on the
  * synthetic corpus, this spec proves the rules actually catch the
  * shapes they claim to catch (and nothing survives a scrub).
  */
class RedactionSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val planted = Seq(
    (1L, "contact john.doe+test@corp-mail.example.com for access"),
    (2L, "server at 192.168.1.100 answered"),
    (3L, "leaked key deadbeefdeadbeefdeadbeefdeadbeef in log"),
    (4L, "call 14155550123 after hours"),
    (5L, "id 123.45.67.89 and ticket 99999999 filed"),
    (6L, "digits 12345678@example.org belong to the email"),
    (7L, "nothing sensitive here at all"),
    // real PII is not lowercase-normalized (review r10): mixed case
    (8L, "mail John.Doe+x@Corp-Mail.Example.COM today"),
    (9L, "token DEADBEEFdeadbeefDEADBEEFdeadbeef leaked"))

  private def scrubbed = planted.toDF("id", "text")
    .select(col("id"), Redaction.scrub(col("text")).as("red"),
      Redaction.counts(col("text")).as("c"))

  test("every default rule catches its shape and nothing survives") {
    val rows = scrubbed.orderBy("id").collect()
    val red = rows.map(_.getString(1))
    assert(red(0) == "contact <EMAIL> for access")
    assert(red(1) == "server at <IP> answered")
    assert(red(2) == "leaked key <SECRET> in log")
    assert(red(3) == "call <NUMBER> after hours")
    assert(red(4) == "id <IP> and ticket <NUMBER> filed")
    // the email rule consumes its local-part digits BEFORE the digit-run
    // rule ever sees them — rule order is part of the contract
    assert(red(5) == "digits <EMAIL> belong to the email")
    assert(red(6) == "nothing sensitive here at all")
    assert(red(7) == "mail <EMAIL> today")
    assert(red(8) == "token <SECRET> leaked")
    // no pattern matches anything post-scrub (full-scrub property)
    Redaction.defaultRules.foreach { r =>
      val residual = scrubbed
        .select(sum(regexp_count(col("red"), lit(r.pattern)))).first().getLong(0)
      assert(residual == 0L, s"rule ${r.token} left residual matches")
    }
  }

  test("scrub is idempotent") {
    val twice = planted.toDF("id", "text")
      .select(col("id"), Redaction.scrub(Redaction.scrub(col("text"))).as("red"))
      .orderBy("id").collect().map(_.getString(1))
    val once = scrubbed.orderBy("id").collect().map(_.getString(1))
    assert(twice.toSeq == once.toSeq)
  }

  test("counts are staged: a span consumed by an earlier rule is not re-reported") {
    val c = scrubbed.orderBy("id")
      .select("c.email", "c.ip", "c.secret", "c.number").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(c(0) == ((1, 0, 0, 0)))
    assert(c(1) == ((0, 1, 0, 0)))
    assert(c(2) == ((0, 0, 1, 0)))
    assert(c(3) == ((0, 0, 0, 1)))
    assert(c(4) == ((0, 1, 0, 1)))
    assert(c(5) == ((1, 0, 0, 0))) // the 8-digit run rode the email out
    assert(c(6) == ((0, 0, 0, 0)))
    assert(c(7) == ((1, 0, 0, 0)))
    assert(c(8) == ((0, 0, 1, 0)))
  }
}
