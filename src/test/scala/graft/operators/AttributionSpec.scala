package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, String, Double)*) =
    rows.toDF("user_id", "ts_s", "event_type", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))

  test("last-touch attribution on a hand-built timeline") {
    val events = ev(
      // user 1: view is the LATEST touch before the purchase
      (1L, "2024-01-01 00:00:00", "click", 0.0),
      (1L, "2024-01-01 01:00:00", "view", 0.0),
      (1L, "2024-01-01 02:00:00", "purchase", 10.0),
      // user 2: only touch is outside the 3-day lookback
      (2L, "2024-01-01 00:00:00", "click", 0.0),
      (2L, "2024-01-11 00:00:00", "purchase", 20.0),
      // user 3: no touches at all
      (3L, "2024-01-01 00:00:00", "purchase", 5.0),
      // user 4: same-instant click+view collapse to min = click
      (4L, "2024-01-01 00:00:00", "click", 0.0),
      (4L, "2024-01-01 00:00:00", "view", 0.0),
      (4L, "2024-01-01 00:30:00", "purchase", 7.5))
    val out = Events.attribution(events, "user_id", "ts", "event_type",
        "value", "purchase", Seq("click", "view"),
        lookbackSeconds = 3L * 86400L)
      .orderBy("channel")
      .as[(String, Long, Double)].collect().toSeq
    assert(out == Seq(("click", 1L, 7.5), ("unattributed", 2L, 25.0),
      ("view", 1L, 10.0)))
  }

  test("credited conversions partition the conversion set") {
    val events = graft.tables.Tables.events(spark, sf("sf0.001"))
    val out = Events.attribution(events, "user_id", "ts", "event_type",
      "value", "purchase", Seq("click", "view"), 86400L)
    val total = out.agg(sum("n_conversions")).as[Long].collect()(0)
    val nConv = events.filter(col("event_type") === "purchase").count()
    assert(total == nConv)
  }
}
