package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunnelStepsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, String)*) =
    rows.toDF("user_id", "ts_s", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s")))

  test("k-step chain semantics on a hand-built timeline") {
    val events = ev(
      // user 1: full chain within window
      (1L, "2024-01-01 00:00:00", "view"),
      (1L, "2024-01-01 01:00:00", "click"),
      (1L, "2024-01-01 02:00:00", "purchase"),
      // user 2: click BEFORE the view anchor — stalls at stage 1
      (2L, "2024-01-02 00:00:00", "click"),
      (2L, "2024-01-03 00:00:00", "view"),
      // user 3: full chain, purchase outside the 1-day window
      (3L, "2024-01-01 00:00:00", "view"),
      (3L, "2024-01-01 01:00:00", "click"),
      (3L, "2024-01-03 00:00:00", "purchase"),
      // user 4: no anchor — excluded entirely
      (4L, "2024-01-01 00:00:00", "click"),
      (4L, "2024-01-01 01:00:00", "purchase"),
      // user 5: view and click share a timestamp (>= admits)
      (5L, "2024-01-01 00:00:00", "view"),
      (5L, "2024-01-01 00:00:00", "click"))
    val out = Events.funnelSteps(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), windowSeconds = 86400L)
      .orderBy("user_id")
      .select("user_id", "n_stages", "converted")
      .as[(Long, Int, Boolean)].collect().toSeq
    assert(out == Seq((1L, 3, true), (2L, 1, false), (3L, 3, false),
      (5L, 2, false)))
  }

  test("two-step funnelSteps agrees with the dedicated funnel op") {
    val events = graft.tables.Tables.events(spark, sf("sf0.001"))
    val general = Events.funnelSteps(events, "user_id", "ts", "event_type",
        Seq("click", "purchase"), windowSeconds = 7L * 86400L)
      .select(col("user_id"), col("converted"))
    val dedicated = Events.funnel(events, "user_id", "ts", "event_type",
        "click", "purchase", windowSeconds = 7L * 86400L)
      .select(col("user_id"), col("converted"))
    assert(general.exceptAll(dedicated).count() == 0L)
    assert(dedicated.exceptAll(general).count() == 0L)
    assert(general.count() > 0L)
  }
}
