package graft.operators

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

class EventsWindowSpec extends SparkSpec {
  import spark.implicits._

  private def ev = Tables.events(spark, sf())

  test("hopping windows emit each event into exactly width/slide windows") {
    val ev = Tables.events(spark, sf())
    val n = ev.count()
    val hop = Events.hoppingAgg(ev, "ts", "event_type", "value",
      width = "1 hour", slide = "15 minutes")
    assert(hop.agg(sum("n_events")).head().getLong(0) == 4 * n,
      "every event must land in 4 hourly windows on the 15-min grid")
    // the tumbling aggregate is the slide == width degenerate case
    val tum = Events.tumblingAgg(ev, "ts", "event_type", "value", "1 hour")
      .collect().toSet
    val hop2 = Events.hoppingAgg(ev, "ts", "event_type", "value",
      "1 hour", "1 hour").collect().toSet
    assert(hop2 == tum, "slide == width must equal the tumbling aggregate")
  }

  test("histogram clamps out-of-range values into the edge buckets") {
    import spark.implicits._
    val ev = Seq(
      ("a", -5.0), ("a", 0.0), ("a", 49.9), ("a", 50.0), ("a", 449.9),
      ("a", 450.0), ("a", 9999.0)).toDF("event_type", "value")
    val h = Events.histogram(ev, "event_type", "value",
        lo = 0.0, hi = 450.0, nbins = 9)
      .select("bucket", "n").as[(Long, Long)].collect().toMap
    // -5 clamps into bucket 0; 450 and 9999 into bucket 8
    assert(h(0L) == 3 && h(1L) == 1 && h(8L) == 3,
      s"unexpected bucket counts: $h")
    assert(h.values.sum == 7, "every row must land in exactly one bucket")
  }

  test("transitions count every non-first event once; rows sum to p=1") {
    val ev = Tables.events(spark, sf())
    val t = Events.transitions(ev, "user_id", "ts", "event_type", "event_id")
      .collect()
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    assert(t.map(_.getAs[Long]("n")).sum == nEvents - nUsers,
      "each user's first event has no predecessor; all others transition")
    t.groupBy(_.getAs[String]("prev_type")).foreach { case (pt, rows) =>
      val psum = rows.map(_.getAs[Double]("p")).sum
      assert(math.abs(psum - 1.0) < 1e-4, s"row $pt sums to $psum")
    }
  }

  test("rolling matches a brute-force self-join on a small slice") {
    val slice = ev.filter(col("user_id") < 20)
    val got = Events.rolling(slice, "user_id", "ts", "value", 3600L)
      .select("event_id", "n_win").as[(Long, Long)].collect().toMap
    val a = slice.select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("us"))
    val b = slice.select(col("user_id").as("u2"),
      unix_micros(col("ts")).as("us2"))
    val want = a.join(b, col("user_id") === col("u2") &&
        col("us2") <= col("us") && col("us2") >= col("us") - 3600000000L)
      .groupBy("event_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("rolling includes peers at the exact same timestamp (RANGE frame)") {
    val df = Seq(
      (1L, 1L, "2024-01-01 00:00:00", 1.0),
      (2L, 1L, "2024-01-01 00:00:00", 2.0), // same instant as event 1
      (3L, 1L, "2024-01-01 02:00:00", 4.0)  // outside the hour window
    ).toDF("event_id", "user_id", "s", "value")
      .withColumn("ts", to_timestamp(col("s"))).drop("s")
    val out = Events.rolling(df, "user_id", "ts", "value", 3600L)
      .select("event_id", "n_win", "sum_win")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 2L, 3.0), (2L, 2L, 3.0), (3L, 1L, 4.0)))
  }

  test("deltas: first event per user has null gap and null prev") {
    val out = Events.deltas(ev, "user_id", "ts", "event_id")
    val firsts = ev.groupBy("user_id").agg(min_by(col("event_id"),
      struct(col("ts"), col("event_id"))).as("first_id"))
    val joined = out.join(firsts,
      out("event_id") === firsts("first_id"))
    assert(joined.count() == firsts.count())
    assert(joined.filter(col("gap_us").isNotNull ||
      col("prev_event_id").isNotNull).count() == 0)
    // every non-first event has a non-negative gap
    assert(out.filter(col("gap_us") < 0).count() == 0)
  }

  test("funnel: B before A doesn't convert, window boundary is inclusive, " +
    "A-only users report false") {
    def ev(id: Long, u: Long, t: String, tp: String) = (id, u, t, tp)
    val df = Seq(
      // u1: purchase BEFORE first click only -> not converted
      ev(1, 1, "2024-01-02 00:00:00", "click"),
      ev(2, 1, "2024-01-01 00:00:00", "purchase"),
      // u2: purchase exactly at the window boundary -> converted
      ev(3, 2, "2024-01-01 00:00:00", "click"),
      ev(4, 2, "2024-01-08 00:00:00", "purchase"),
      // u3: purchase one second past the boundary -> not converted
      ev(5, 3, "2024-01-01 00:00:00", "click"),
      ev(6, 3, "2024-01-08 00:00:01", "purchase"),
      // u4: click, no purchase at all
      ev(7, 4, "2024-01-01 00:00:00", "click"),
      // u5: purchase only -> absent from the funnel
      ev(8, 5, "2024-01-01 00:00:00", "purchase")
    ).toDF("event_id", "user_id", "s", "event_type")
      .withColumn("ts", to_timestamp(col("s"))).drop("s")
    val out = Events.funnel(df, "user_id", "ts", "event_type",
        "click", "purchase", 7L * 86400L)
      .select("user_id", "converted").as[(Long, Boolean)]
      .collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, false), (2L, true), (3L, false), (4L, false)))
  }

  test("retention: the day-0 cell of each cohort equals the cohort size") {
    val cohorts = Events.retentionCohorts(ev, "user_id", "ts")
    val day0 = cohorts.filter(col("day_offset") === 0)
      .agg(sum("n_active")).head().getLong(0)
    val nUsers = ev.select("user_id").distinct().count()
    // every user is active on their own first day
    assert(day0 == nUsers, s"day-0 total $day0 != $nUsers users")
    assert(cohorts.filter(col("day_offset") < 0).count() == 0)
  }

  test("anomalies flags exactly the values past the z threshold, " +
    "invariant under partitioning") {
    // type A: 9 values at 10.0 and one at 100 -> the 100 is ~3 sigma out
    val df = ((1 to 9).map(i => (i.toLong, "A", 10.0)) ++
      Seq((10L, "A", 100.0)) ++
      (11 to 20).map(i => (i.toLong, "B", 5.0))) // zero-variance type
      .toDF("event_id", "event_type", "value")
    val out = Events.anomalies(df, "event_type", "value", "event_id", 2.5)
      .select("event_id").as[Long].collect().toSeq
    assert(out == Seq(10L), s"expected only the planted outlier, got $out")
    val out13 = Events.anomalies(df.repartition(13), "event_type", "value",
      "event_id", 2.5).select("event_id").as[Long].collect().toSeq
    assert(out13 == out, "flags must not depend on partitioning")
    // zero-variance groups produce z = value-mean / 0 -> NaN, never > t
    assert(!out.exists(_ > 10L), "zero-variance type B must flag nothing")
  }

  test("anomalies: near-constant group whose variance rounds negative " +
    "flags nothing (clamp, no NaN std)") {
    // all values 0.0005: v*v rounds to 0 in decimal(28,6), so
    // ss/n - (s/n)^2 = -2.5e-7 — unclamped, sqrt gives NaN std, which
    // passes the =!= 0.0 guard and flags EVERY row via NaN ordering
    val df = (1 to 10).map(i => (i.toLong, "C", 0.0005))
      .toDF("event_id", "event_type", "value")
    val out = Events.anomalies(df, "event_type", "value", "event_id", 2.5)
    assert(out.count() == 0,
      "degenerate-variance group must flag nothing, not every row")
  }

  test("robustOutliers: median/MAD flags resist masking that inflates " +
    "the std gate, zero-MAD groups flag nothing") {
    // type A: 8 values near 10 plus TWO extreme outliers. With k equal
    // outliers among n points, the z they can reach is bounded near
    // sqrt((n-k)/k) = 2 here — the pair inflates the std it is judged
    // against, so NEITHER clears the 2.5-sigma mean/std gate (masking);
    // median/MAD ignores them (50% breakdown) and flags exactly both.
    val a = (1 to 8).map(i => (i.toLong, "A", 10.0 + (i % 3) * 0.1)) ++
      Seq((19L, "A", 500.0), (20L, "A", 520.0))
    // type B: constant -> MAD 0 -> nothing flagged
    val b = (21 to 30).map(i => (i.toLong, "B", 7.0))
    val df = (a ++ b).toDF("event_id", "event_type", "value")
    val robust = Events.robustOutliers(df, "event_type", "value", "event_id", 3.5)
      .select("event_id").as[Long].collect().toSet
    assert(robust == Set(19L, 20L), s"expected the two planted outliers, got $robust")
    val masked = Events.anomalies(df, "event_type", "value", "event_id", 2.5)
      .select("event_id").as[Long].collect().toSet
    assert(masked.subsetOf(Set(19L, 20L)) && masked.size < 2,
      s"fixture must demonstrate masking in the std gate, got $masked")
    // invariant under partitioning (exact percentile, fixed IEEE ops)
    val rep = Events.robustOutliers(df.repartition(13), "event_type",
      "value", "event_id", 3.5).select("event_id").as[Long].collect().toSet
    assert(rep == robust)
  }

  test("JSON property extraction yields null for corrupt or missing keys") {
    val df = Seq(
      (1L, """{"k": 7}"""), (2L, """{"j": 1}"""),
      (3L, "not json at all"), (4L, null.asInstanceOf[String])
    ).toDF("event_id", "props")
    val out = df.select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out == Map(1L -> Some(7L), 2L -> None, 3L -> None, 4L -> None))
  }

  test("deltas gap is integer-exact micros between consecutive events") {
    val df = Seq(
      (1L, 7L, "2024-01-01 00:00:00.000001"),
      (2L, 7L, "2024-01-01 00:00:00.000003"),
      (3L, 7L, "2024-01-01 00:00:01.000003")
    ).toDF("event_id", "user_id", "s")
      .withColumn("ts", to_timestamp(col("s"))).drop("s")
    val out = Events.deltas(df, "user_id", "ts", "event_id")
      .select("event_id", "gap_us").as[(Long, Option[Long])]
      .collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, None), (2L, Some(2L)), (3L, Some(1000000L))))
  }
}
