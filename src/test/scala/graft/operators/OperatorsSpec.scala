package graft.operators

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** Specs for text analysis, multimodal plumbing, events and change-log
  * operators on the sf0.001 tables. */
class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("langId picks the dominant marker language deterministically") {
    val docs = Seq(
      (1L, "the cat and the dog is in a house"),
      (2L, "der hund und die katze ist nicht ein haus"),
      (3L, "zzz qqq www")). toDF("doc_id", "text")
    val out = TextAnalysis.langId(docs, "doc_id", "text")
      .select("doc_id", "detected").as[(Long, String)].collect().toMap
    assert(out(1L) == "en" && out(2L) == "de")
    assert(out(3L) == "en") // all-zero tie resolves to first language
  }

  test("langMix flags code-switched docs, not monolingual or noise docs") {
    val docs = Seq(
      // solid English, one stray French hit: relative gate fails
      (1L, "the cat and the dog is in a house the end of it le"),
      // genuine half-and-half: both gates pass
      (2L, "the cat and the dog le chat est une bete"),
      // monolingual German
      (3L, "der hund und die katze ist nicht ein haus"),
      // single foreign marker: absolute gate (>= 2) fails
      (4L, "the cat and the dog is le"),
      (5L, "zzz qqq")).toDF("doc_id", "text")
    val out = TextAnalysis.langMix(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getBoolean(5))).toMap
    assert(out(2L)._1 == "en" && out(2L)._2 == "fr" && out(2L)._3)
    assert(!out(1L)._3 && !out(3L)._3 && !out(4L)._3 && !out(5L)._3)
    assert(out(3L)._1 == "de")
    // secondary is never the primary
    assert(out.values.forall(v => v._1 != v._2))
  }

  test("quality ratios are in range on real docs") {
    val docs = Tables.documents(spark, sf()).withColumn("text", coalesce(col("text"), lit("")))
    val out = TextAnalysis.quality(docs, "doc_id", "text")
    val bad = out.filter(
      col("distinct_ratio") > 1 || col("distinct_ratio") < 0 ||
      col("stopword_ratio") > 1 || col("stopword_ratio") < 0).count()
    assert(bad == 0)
    assert(out.count() == docs.count())
  }

  test("tokenCounts: bpe-ish >= whitespace tokens") {
    val docs = Tables.documents(spark, sf()).withColumn("text", coalesce(col("text"), lit("")))
    val out = TextAnalysis.tokenCounts(docs, "doc_id", "text")
    assert(out.filter(col("bpe_tokens") < col("ws_tokens")).count() == 0)
  }

  test("multimodal stub decode preserves ids and emits fixed-dim features") {
    val docs = Tables.documents(spark, sf()).limit(50)
    val media = Multimodal.asBinary(docs, "doc_id", "text")
      .select(col("doc_id"), col("payload"), col("meta.n_bytes").as("n_bytes"),
        col("meta.media_type").as("media_type"))
      .filter(col("payload").isNotNull)
      .as[Multimodal.MediaRow]
    val feats = Multimodal.stubDecode(media, featDim = 8).collect()
    assert(feats.nonEmpty)
    assert(feats.forall(_.feature.length == 8))
    // deterministic: same payload -> same features
    val again = Multimodal.stubDecode(media, featDim = 8).collect()
    assert(feats.map(_.feature.toSeq).toSeq == again.map(_.feature.toSeq).toSeq)
  }

  test("sessionize: gap splits sessions, counts preserved") {
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), 1L),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 1L)
    ).toDF("event_id", "ts", "user_id")
    val out = Events.sessionize(ev, "user_id", "ts", "event_id", gapSeconds = 3600)
      .select("session", "n_events").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 2L, 2L -> 1L))
  }

  test("snapshotAsOf picks the last record per key, tie-broken") {
    val log = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 10L, "a"),
      (1L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), 11L, "b"),
      (1L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), 12L, "c"),
      (1L, java.sql.Timestamp.valueOf("2024-06-01 00:00:00"), 13L, "late"),
      (2L, java.sql.Timestamp.valueOf("2024-01-03 00:00:00"), 20L, "x")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val snap = ChangeLog.snapshotAsOf(log, "user_id", "ts", "event_id",
      to_timestamp(lit("2024-02-01 00:00:00")), Seq("event_type"))
      .select("user_id", "event_type").as[(Long, String)].collect().toMap
    assert(snap == Map(1L -> "c", 2L -> "x"))
  }

  test("snapshotAsOfColumns reconstructs each column at its own vintage") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val log = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, Option("a1"), Option.empty[Double]),
      (1L, ts("2024-01-05 00:00:00"), 2L, Option.empty[String], Option(10.0)),
      (1L, ts("2024-01-20 00:00:00"), 3L, Option("a2"), Option.empty[Double]),
      (2L, ts("2024-01-02 00:00:00"), 4L, Option("b1"), Option(5.0))
    ).toDF("k", "ts", "id", "col_a", "col_b")
    val snap = ChangeLog.snapshotAsOfColumns(log, "k", "ts", "id",
        to_timestamp(lit("2024-01-15 00:00:00")), Seq("col_a", "col_b"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(1)), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    // key 1 is mixed-vintage: col_a from Jan 1 (the Jan 20 write is after
    // the asOf cut), col_b from Jan 5 — no single log row ever held (a1, 10.0)
    assert(snap(1L) == (Some("a1"), Some(10.0)))
    assert(snap(2L) == (Some("b1"), Some(5.0)))
  }

  test("cellChanges emits one row per changed cell, null-safe on firsts") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val log = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "open", 1.0),
      (1L, ts("2024-01-02 00:00:00"), 2L, "open", 2.0), // only value changed
      (1L, ts("2024-01-03 00:00:00"), 3L, "done", 2.0)  // only status changed
    ).toDF("k", "ts", "id", "status", "value")
    val out = ChangeLog.cellChanges(log, "k", "ts", "id", Seq("status", "value"))
      .select("id", "column", "old_value", "new_value")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)), r.getString(3))).toSet
    assert(out == Set(
      (1L, "status", None, "open"), (1L, "value", None, "1.0"),
      (2L, "value", Some("1.0"), "2.0"),
      (3L, "status", Some("open"), "done")))
  }

  test("approx quantiles sit within the rank-error bound of exact") {
    val orders = Tables.orders(spark, sf())
    val acc = 10000
    val rows = orders.groupBy("o_orderstatus")
      .agg(expr(s"approx_percentile(o_totalprice, 0.5, $acc)").as("apx"),
        expr("sort_array(collect_list(o_totalprice))").as("vals"))
      .collect()
    rows.foreach { r =>
      val vals = r.getSeq[Double](2)
      val apx = r.getDouble(1)
      val n = vals.length
      val err = math.max(1, n / acc) // guaranteed rank error of the sketch
      val lo = vals(math.max(0, (0.5 * n).toInt - err - 1))
      val hi = vals(math.min(n - 1, (0.5 * n).toInt + err + 1))
      assert(apx >= lo && apx <= hi,
        s"approx median $apx outside rank band [$lo, $hi] for n=$n")
    }
  }

  test("fetchLogs pages the newest n entries table-wide") {
    val ev = Tables.events(spark, sf())
    val out = ChangeLog.fetchLogs(ev, "ts", "event_id", 10).collect()
    assert(out.length == 10)
    val all = ev.orderBy(col("ts").desc, col("event_id").desc).limit(10)
      .select("event_id").as[Long].collect().toSeq
    assert(out.map(_.getAs[Long]("event_id")).toSeq == all)
  }
}
