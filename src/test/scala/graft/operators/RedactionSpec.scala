package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RedactionSpec extends SparkSpec {
  import spark.implicits._

  private val fixture = Seq(
    (1L, "write to alice.smith+x@sub.example.org or bob@ex.co today"),
    (2L, "server at 10.0.42.7 fell over, backup 192.168.1.1 took over"),
    (3L, "call 555-0199 or 555-1234"),
    (4L, "mixed: a@b.io from 8.8.8.8 tel 555-0000"),
    (5L, "clean text with no pii at all"),
    (6L, null.asInstanceOf[String])
  ).toDF("doc_id", "text")

  test("clean replaces every PII class and leaves clean text untouched") {
    val got = Redaction.clean(fixture, "text")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(got(1L) == "write to <EMAIL> or <EMAIL> today")
    assert(got(2L) == "server at <IP> fell over, backup <IP> took over")
    assert(got(3L) == "call <PHONE> or <PHONE>")
    assert(got(4L) == "mixed: <EMAIL> from <IP> tel <PHONE>")
    assert(got(5L) == "clean text with no pii at all")
    assert(got(6L) == "", "null text must coalesce to empty, not null")
  }

  test("report counts match clean: round-trip on the redacted md5") {
    val rep = Redaction.report(fixture, "doc_id", "text")
    val counts = rep.select("doc_id", "n_emails", "n_ips", "n_phones")
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, e, i, p) => id -> ((e, i, p)) }.toMap
    assert(counts(1L) == ((2L, 0L, 0L)) && counts(2L) == ((0L, 2L, 0L)) &&
      counts(3L) == ((0L, 0L, 2L)) && counts(4L) == ((1L, 1L, 1L)) &&
      counts(5L) == ((0L, 0L, 0L)))
    // report's md5 is the md5 of clean()'s output — the two paths agree
    val joined = rep.join(
      Redaction.clean(fixture, "text")
        .select(col("doc_id"), md5(col("text")).as("clean_md5")), "doc_id")
    assert(joined.filter(col("redacted_md5") =!= col("clean_md5")).count() == 0)
  }

  test("redaction is idempotent: cleaning twice changes nothing") {
    val once = Redaction.clean(fixture, "text")
    val twice = Redaction.clean(once, "text")
    assert(once.select("doc_id", "text").except(
      twice.select("doc_id", "text")).count() == 0)
  }

  test("stage order: letter-TLD emails win, numeric hosts fall to IPv4") {
    val df = Seq(
      (1L, "u@ex.com from 1.2.3.4"), // email consumed before IP stage
      (2L, "u@1.2.3.4 raw")          // no letter TLD -> not an email; the
                                     // dotted quad is still caught as IP
    ).toDF("doc_id", "text")
    val got = Redaction.clean(df, "text")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(got(1L) == "<EMAIL> from <IP>", s"got '${got(1L)}'")
    assert(got(2L) == "u@<IP> raw", s"got '${got(2L)}'")
  }
}
