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
}
