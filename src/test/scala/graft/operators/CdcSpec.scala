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

  test("latestByKey plan is a partial-aggregated groupBy, not a window sort") {
    val log = (1 to 1000).map(i => (i % 10L, i, s"p$i")).toDF("key", "seq", "val")
    val df = Cdc.latestByKey(log, Seq("key"), Seq("seq"), Seq("val"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"),
      s"expected an aggregate plan:\n$plan")
    assert(!plan.contains("Window"), s"must not plan a window sort:\n$plan")
    assert(df.count() == 10)
  }
}
