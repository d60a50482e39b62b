package graft.operators

import graft.SparkSpec

class CdcSpec extends SparkSpec {
  import spark.implicits._

  test("latestByKey keeps the last writer per key, any partitioning") {
    val log = Seq(
      (1L, 1, 10L, "a"), (1L, 2, 11L, "b"), (1L, 3, 12L, "c"),
      (2L, 1, 13L, "x"), (2L, 2, 9L, "y")) // seq 2 with LOWER payload id
      .toDF("key", "seq", "pid", "val")
    for (parts <- Seq(1, 8)) {
      val out = Cdc.latestByKey(log.repartition(parts), Seq("key"),
          Seq("seq"), Seq("pid", "val"))
        .select("key", "seq", "pid", "val")
        .as[(Long, Int, Long, String)].collect().sortBy(_._1).toSeq
      assert(out == Seq((1L, 3, 12L, "c"), (2L, 2, 9L, "y")),
        s"parts=$parts: $out")
    }
  }

  test("version ties fall through to the next version column, and payload " +
    "never decides") {
    val log = Seq(
      // same (v1), tie broken by v2: row with v2=5 wins even though its
      // payload 'aaa' sorts BELOW the loser's 'zzz'
      (7L, 1, 5, "aaa"), (7L, 1, 3, "zzz")).toDF("key", "v1", "v2", "val")
    val out = Cdc.latestByKey(log, Seq("key"), Seq("v1", "v2"), Seq("val"))
      .select("key", "v1", "v2", "val").as[(Long, Int, Int, String)]
      .collect().toSeq
    assert(out == Seq((7L, 1, 5, "aaa")))
  }

  test("scdType2 intervals tile each key's timeline; current row = latestByKey") {
    val ev = graft.tables.Tables.events(spark, sf())
    val scd = Cdc.scdType2(ev, Seq("user_id"), "ts", Seq("ts", "event_id"))
      .select($"user_id", $"event_id", $"valid_from_us", $"valid_to_us",
        $"is_current")
      .as[(Long, Long, Long, Option[Long], Boolean)].collect()
    val byUser = scd.groupBy(_._1)
    byUser.foreach { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      // half-open intervals tile: each valid_to equals the next
      // version's valid_from; only the last is open-ended/current
      sorted.init.zip(sorted.tail).foreach { case (a, b) =>
        assert(a._4.contains(b._3), s"user $u: gap between $a and $b")
        assert(!a._5, s"user $u: non-final row marked current: $a")
      }
      assert(sorted.last._4.isEmpty && sorted.last._5,
        s"user $u: final version must be open-ended and current")
    }
    // the current rows are exactly the SCD-1 compaction winners
    val current = scd.filter(_._5).map(r => r._1 -> r._2).toMap
    val latest = Cdc.latestByKey(ev, Seq("user_id"), Seq("ts", "event_id"),
        Seq("value")).select($"user_id", $"event_id")
      .as[(Long, Long)].collect().toMap
    assert(current == latest,
      "is_current rows must equal the latestByKey winners")
  }

  test("latestByKey plan is a partial-aggregated groupBy, not a window sort") {
    val log = (1 to 1000).map(i => (i % 10L, i, s"p$i")).toDF("key", "seq", "val")
    val df = Cdc.latestByKey(log, Seq("key"), Seq("seq"), Seq("val"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"),
      s"expected an aggregate plan:\n$plan")
    assert(!plan.contains("Window"), s"must not plan a window sort:\n$plan")
    assert(df.count() == 10)
  }

  test("mergeApply: upsert, delete, insert, pass-through, and " +
    "delete-then-reinsert") {
    val snapshot = Seq(
      (1L, 0, "old1"), (2L, 0, "old2"), (3L, 0, "old3"),
      (5L, 0, "old5")).toDF("key", "seq", "val")
    val log = Seq(
      (2L, 1, "new2", "U"),              // update key 2
      (3L, 1, "x", "D"),                 // delete key 3
      (4L, 1, "new4", "U"),              // insert key 4
      (5L, 1, "x", "D"), (5L, 2, "re5", "U"), // delete then re-insert
      (6L, 1, "new6", "U"), (6L, 2, "x", "D") // insert then delete
    ).toDF("key", "seq", "val", "op")
    val out = Cdc.mergeApply(snapshot, log, Seq("key"), Seq("seq"), "op",
        Seq("val"))
      .select("key", "seq", "val").as[(Long, Int, String)]
      .collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 0, "old1"), (2L, 1, "new2"), (4L, 1, "new4"),
      (5L, 2, "re5")))
  }

  test("snapshotDiff classifies added/removed/changed, null-safe") {
    val before = Seq(
      (1L, Option("a")), (2L, Option("b")), (3L, Option("c")),
      (4L, None: Option[String])).toDF("key", "val")
    val after = Seq(
      (1L, Option("a")),               // unchanged -> absent
      (2L, Option("B")),               // changed
      (4L, Option("now")),             // null -> value IS a change
      (5L, Option("new"))              // added; 3 removed
    ).toDF("key", "val")
    val out = Cdc.snapshotDiff(before, after, Seq("key"), Seq("val"))
      .select("key", "change_type")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq((2L, "changed"), (3L, "removed"), (4L, "changed"),
      (5L, "added")))
  }

  test("mergeApply equals compaction when the log has no deletes") {
    val ev = graft.tables.Tables.events(spark, sf("sf0.001"))
    val cutoff = org.apache.spark.sql.functions.lit("2024-01-16 00:00:00")
      .cast("timestamp")
    import org.apache.spark.sql.functions.{col, lit, when}
    val snapshot = Cdc.latestByKey(ev.filter(col("ts") < cutoff),
      Seq("user_id"), Seq("ts", "event_id"), Seq("event_type", "value"))
    val log = ev.filter(col("ts") >= cutoff).withColumn("op", lit("U"))
    val merged = Cdc.mergeApply(snapshot, log, Seq("user_id"),
        Seq("ts", "event_id"), "op", Seq("event_type", "value"))
      .select("user_id", "ts", "event_id", "event_type", "value")
    val compacted = Cdc.latestByKey(ev, Seq("user_id"),
        Seq("ts", "event_id"), Seq("event_type", "value"))
      .select("user_id", "ts", "event_id", "event_type", "value")
    assert(merged.exceptAll(compacted).count() == 0L)
    assert(compacted.exceptAll(merged).count() == 0L)
  }
}
