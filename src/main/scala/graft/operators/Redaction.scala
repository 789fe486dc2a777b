package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII / secret redaction over text columns — the curation step a
  * training-data pipeline runs before anything else sees the corpus
  * (builder brief: text analysis family; the reference's governance
  * layer masks columns at serving time via md5, `dp_demo.sql:222-239` —
  * this is the corpus-side analogue that removes sensitive SPANS inside
  * free text rather than whole columns).
  *
  * Pure `regexp_replace`/`regexp_count` composition — codegen'd
  * builtins, no UDF — so at 100 TB this is an embarrassingly parallel
  * narrow projection that rides whatever scan is already happening;
  * adding redaction to an existing pass costs no extra shuffle and no
  * extra scan.
  *
  * Rule order is part of the contract (rules apply left to right, each
  * over the previous rule's output): emails go first so their local-part
  * digits are consumed before the digit-run rule sees them; IPv4 before
  * digit-run so octets are never half-eaten; hex secrets before
  * digit-run because a 32+ hex token can be all-digits. Patterns stay
  * inside the RE2-compatible subset (character classes, bounded/unbounded
  * repetition — no backrefs, no lookaround) so the SAME pattern text runs
  * identically in Spark (Java regex) and the DuckDB oracle (RE2);
  * t5_redact_pii hash-matches the full composition cross-engine.
  */
object Redaction {

  /** One redaction rule: every non-overlapping match of `pattern` is
    * replaced by `token`.
    */
  final case class Rule(pattern: String, token: String)

  /** Default rule set, in application order. The letter-bearing rules
    * are case-insensitive via inline `(?i)` — RE2 and Java agree on it —
    * because real PII is not lowercase-normalized: without it
    * `John.Doe@Corp.com` or an uppercase hex token sails through the
    * scrub (RedactionSpec pins the mixed-case shapes).
    */
  val defaultRules: Seq[Rule] = Seq(
    Rule("(?i)[a-z0-9._%+-]+@[a-z0-9.-]+", "<EMAIL>"),
    Rule("([0-9]{1,3}\\.){3}[0-9]{1,3}", "<IP>"),
    Rule("(?i)[a-f0-9]{32,}", "<SECRET>"),
    Rule("[0-9]{7,}", "<NUMBER>"))

  /** The redacted text: `rules` folded into nested `regexp_replace`
    * calls — one codegen'd expression, no UDF.
    */
  def scrub(text: Column, rules: Seq[Rule] = defaultRules): Column =
    rules.foldLeft(text) { case (c, Rule(p, t)) => regexp_replace(c, p, t) }

  /** Per-rule match counts as a struct column (field name = token minus
    * the angle brackets, lowercased): the audit trail — HOW MUCH was
    * redacted is itself a corpus-quality signal. Counts are measured the
    * same way the scrub consumes matches: each rule counts on the text
    * AFTER the previous rules ran, so a digit run inside an email is
    * never double-reported.
    */
  def counts(text: Column, rules: Seq[Rule] = defaultRules): Column = {
    val staged = rules.inits.toSeq.reverse.init // prefixes: [], [r1], [r1,r2]...
    struct(rules.zip(staged).map { case (Rule(p, t), prefix) =>
      regexp_count(scrub(text, prefix), lit(p))
        .as(t.stripPrefix("<").stripSuffix(">").toLowerCase)
    }: _*)
  }
}
