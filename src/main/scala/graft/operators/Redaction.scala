package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction for training-data curation (SURVEY.md §2.2 extension):
  * scrub emails, IPv4 addresses, and phone-shaped numbers from document
  * text before it reaches a training corpus — the standard pre-release
  * scrubbing pass (e.g. the BigScience ROOTS/BigCode StarCoder pipelines
  * redact exactly these classes with regex rules).
  *
  * Scale posture: a sequential `regexp_replace` chain is a pure per-row
  * projection — it pipelines with the parquet scan inside whole-stage
  * codegen, shuffles nothing, and redacting 100 TB costs exactly one
  * pass over the text bytes. The patterns are RE2-compatible (no
  * backrefs, no lookaround) so the DuckDB oracle applies the IDENTICAL
  * regexes; counts are taken per stage on the stage's input so they
  * agree with what the sequential chain actually replaced.
  *
  * The reference has no redaction surface; this is part of the
  * beyond-reference training-pipeline family.
  */
object Redaction {

  /** RE2-safe PII patterns (shared verbatim with the DuckDB oracle). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{3}-\\d{4}\\b"

  /** Redaction applied in a fixed order (email → IPv4 → phone), each
    * stage over the previous stage's output. Order matters: the email
    * pattern consumes dotted hosts that the bare IPv4 pattern could
    * otherwise double-hit, and phone-shaped digit runs are matched only
    * after dotted forms are gone. */
  def redactedCol(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Per-doc redaction report: per-class hit counts (counted on the same
    * intermediate the sequential chain replaces on) plus the md5 of the
    * fully redacted text — a content-exact check that the oracle's chain
    * produced byte-identical output. */
  def report(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t0 = coalesce(col(textCol), lit(""))
    val t1 = regexp_replace(t0, EmailRe, "<EMAIL>")
    val t2 = regexp_replace(t1, Ipv4Re, "<IP>")
    val t3 = regexp_replace(t2, PhoneRe, "<PHONE>")
    docs.select(col(idCol),
      regexp_count(t0, lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(t1, lit(Ipv4Re)).cast("long").as("n_ips"),
      regexp_count(t2, lit(PhoneRe)).cast("long").as("n_phones"),
      md5(t3).as("redacted_md5"),
      length(t3).cast("long").as("n_chars_redacted"))
  }

  /** Scrubbed corpus: same rows, text redacted in place. */
  def clean(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn(textCol, redactedCol(coalesce(col(textCol), lit(""))))
}
