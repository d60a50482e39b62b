package graft.operators

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  test("asOfJoin picks the latest right row at or before each left ts") {
    val left = Seq(
      (1L, ts(10), 100L), // after r@5 -> 5
      (1L, ts(20), 101L), // after r@20 (tie matches) -> 20
      (1L, ts(3), 102L),  // before any right -> null
      (2L, ts(30), 103L)  // other key, no right rows -> null
    ).toDF("k", "ts", "lid")
    val right = Seq(
      (1L, ts(5), "r5"), (1L, ts(20), "r20"), (1L, ts(25), "r25")
    ).toDF("k", "ts", "rv")
    val out = TemporalJoins.asOfJoin(left, right, "k", "ts", Seq("rv"))
      .select("lid", "asof_rv").as[(Long, Option[String])].collect().toMap
    assert(out == Map(100L -> Some("r5"), 101L -> Some("r20"),
      102L -> None, 103L -> None))
  }

  test("asOfJoin completes on one 10^6-row hot key (single-task sort, spillable)") {
    // the hot-key ceiling documented on asOfJoin: ALL rows share one key,
    // so the window runs in ONE task — this proves the path completes
    // (sort is disk-spillable) and stays correct, it just serializes
    val n = 1000000
    val left = spark.range(n).select(lit(1L).as("k"),
      timestamp_micros(col("id") * 2000000L + 1000000L).as("ts"),
      col("id").as("lid"))
    val right = spark.range(n / 100).select(lit(1L).as("k"),
      timestamp_micros(col("id") * 200000000L).as("ts"),
      (col("id") * 100L).as("rv"))
    val out = TemporalJoins.asOfJoin(left, right, "k", "ts", Seq("rv"))
    // every left row at t has a prior right row at floor(t/200s)*200s,
    // whose rv = that index * 100
    val bad = out.filter(
      col("asof_rv") =!= floor((col("lid") * 2L + 1L) / 200L) * 100L).count()
    assert(bad == 0L)
    assert(out.count() == n.toLong)
  }

  test("asOfJoinSharded == asOfJoin on the 10^6-row hot key, without the " +
       "single-partition window") {
    val n = 1000000
    val left = spark.range(n).select(lit(1L).as("k"),
      timestamp_micros(col("id") * 2000000L + 1000000L).as("ts"),
      col("id").as("lid"))
    val right = spark.range(n / 100).select(lit(1L).as("k"),
      timestamp_micros(col("id") * 200000000L).as("ts"),
      (col("id") * 100L).as("rv"))
    val out = TemporalJoins.asOfJoinSharded(left, right, "k", "ts", Seq("rv"),
      shards = 32)
    // same closed-form truth as the plain asOfJoin spec above — including
    // the cross-shard carries (a shard whose first right row comes late
    // must serve its early left rows from the previous shard's state)
    val bad = out.filter(
      col("asof_rv") =!= floor((col("lid") * 2L + 1L) / 200L) * 100L).count()
    assert(bad == 0L)
    assert(out.count() == n.toLong)
    // the hot path's big window partitions by (k, __shard) — the hot key
    // fans out over the shard dimension instead of one task
    val plan = out.queryExecution.executedPlan.toString
    val windowLines = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windowLines.exists(l => l.contains("__shard") && l.contains("__rc")),
      s"carry window is not sharded:\n$plan")
  }

  test("asOfJoinSharded: boundary placement cannot change results " +
       "(multi-key, nulls before first right row)") {
    val left = Seq(
      (1L, ts(10), 100L), (1L, ts(20), 101L), (1L, ts(3), 102L),
      (2L, ts(30), 103L)
    ).toDF("k", "ts", "lid")
    val right = Seq(
      (1L, ts(5), "r5"), (1L, ts(20), "r20"), (1L, ts(25), "r25")
    ).toDF("k", "ts", "rv")
    val expect = TemporalJoins.asOfJoin(left, right, "k", "ts", Seq("rv"))
      .select("lid", "asof_rv").as[(Long, Option[String])].collect().toMap
    for (shards <- Seq(1, 2, 3, 7, 64)) {
      val got = TemporalJoins.asOfJoinSharded(left, right, "k", "ts", Seq("rv"),
          shards = shards)
        .select("lid", "asof_rv").as[(Long, Option[String])].collect().toMap
      assert(got == expect, s"shards=$shards diverged")
    }
  }

  test("asOfJoin tolerance drops matches staler than the bound, keeps the row") {
    val left = Seq(
      (1L, ts(10), 100L), // r@5: 5 min stale, within 10-min tolerance
      (1L, ts(40), 101L), // r@25: 15 min stale -> dropped to null
      (1L, ts(25), 102L)  // exact-ts match: 0 stale, always kept
    ).toDF("k", "ts", "lid")
    val right = Seq(
      (1L, ts(5), "r5"), (1L, ts(25), "r25")
    ).toDF("k", "ts", "rv")
    val out = TemporalJoins.asOfJoin(left, right, "k", "ts", Seq("rv"),
        toleranceSec = Some(600L))
      .select("lid", "asof_rv").as[(Long, Option[String])].collect().toMap
    assert(out == Map(100L -> Some("r5"), 101L -> None, 102L -> Some("r25")),
      s"got $out")
  }

  test("asOfJoin direction: forward takes the earliest following right, " +
       "nearest takes the closer side with backward winning ties") {
    val left = Seq(
      (1L, ts(10), 100L), // b=r5 (5 back), f=r20 (10 fwd) -> nearest=b
      (1L, ts(18), 101L), // b=r5 (13 back), f=r20 (2 fwd) -> nearest=f
      (1L, ts(30), 102L), // b=r20/f=r40: 10 back vs 10 fwd TIE -> backward
      (1L, ts(50), 103L), // after the last right: forward -> null
      (1L, ts(3), 104L)   // before the first right: backward -> null
    ).toDF("k", "ts", "lid")
    val right = Seq(
      (1L, ts(5), "r5"), (1L, ts(20), "r20"), (1L, ts(40), "r40")
    ).toDF("k", "ts", "rv")
    def run(dir: String) =
      TemporalJoins.asOfJoin(left, right, "k", "ts", Seq("rv"), direction = dir)
        .select("lid", "asof_rv").as[(Long, Option[String])].collect().toMap
    assert(run("forward") == Map(100L -> Some("r20"), 101L -> Some("r20"),
      102L -> Some("r40"), 103L -> None, 104L -> Some("r5")))
    assert(run("nearest") == Map(100L -> Some("r5"), 101L -> Some("r20"),
      102L -> Some("r20"), 103L -> Some("r40"), 104L -> Some("r5")))
    intercept[IllegalArgumentException] {
      TemporalJoins.asOfJoin(left, right, "k", "ts", Seq("rv"),
        direction = "sideways")
    }
  }

  test("asOfJoinSharded inherits the tolerance gate (== plain, any shards)") {
    val left = Seq(
      (1L, ts(10), 100L), (1L, ts(40), 101L), (1L, ts(25), 102L),
      (2L, ts(30), 103L)
    ).toDF("k", "ts", "lid")
    val right = Seq(
      (1L, ts(5), "r5"), (1L, ts(25), "r25")
    ).toDF("k", "ts", "rv")
    val expect = TemporalJoins.asOfJoin(left, right, "k", "ts", Seq("rv"),
        toleranceSec = Some(600L))
      .select("lid", "asof_rv").as[(Long, Option[String])].collect().toMap
    for (shards <- Seq(1, 3, 16)) {
      val got = TemporalJoins.asOfJoinSharded(left, right, "k", "ts",
          Seq("rv"), shards = shards, toleranceSec = Some(600L))
        .select("lid", "asof_rv").as[(Long, Option[String])].collect().toMap
      assert(got == expect, s"shards=$shards diverged: $got")
    }
  }

  test("bandedRangeJoin matches each in-band pair exactly once") {
    val a = Seq((1L, 1L, ts(0)), (1L, 2L, ts(59)), (1L, 3L, ts(200)))
      .toDF("k", "a_id", "a_ts")
    val b = Seq((1L, 10L, ts(30)), (1L, 11L, ts(240)), (2L, 12L, ts(30)))
      .toDF("k", "b_id", "b_ts")
    val out = TemporalJoins.bandedRangeJoin(a, b, "k", "a_ts", "b_ts",
        toleranceSec = 3600)
      .select("a_id", "b_id").as[(Long, Long)].collect().sorted
    // in-band pairs: 0↔30 (30m), 59↔30 (29m), 200↔240 (40m); key 2's row
    // never joins key 1; nothing appears twice despite the ±1-bin explode
    assert(out.toSeq == Seq((1L, 10L), (2L, 10L), (3L, 11L)))
  }
}
