package graft.operators

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  private def ev = Tables.events(spark, sf())

  test("salted join returns exactly the plain join's rows") {
    val dim = ev.groupBy("event_type").agg(count(lit(1)).as("type_n"))
    val plain = ev.join(dim, "event_type")
      .select("event_id", "event_type", "type_n")
      .as[(Long, String, Long)].collect().sorted.toSeq
    val salted = Skew.saltedJoin(ev, dim, Seq("event_type"), "event_id", 8)
      .select("event_id", "event_type", "type_n")
      .as[(Long, String, Long)].collect().sorted.toSeq
    assert(salted == plain)
  }

  test("salted join preserves duplicate small-side rows (cardinality-exact)") {
    val big = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "k")
    // two dim rows for key "a" -> each big "a" row matches both
    val small = Seq(("a", 10), ("a", 11), ("b", 20)).toDF("k", "v")
    val out = Skew.saltedJoin(big, small, Seq("k"), "id", 4)
      .select("id", "v").as[(Long, Int)].collect().sorted.toSeq
    assert(out == Seq((1L, 10), (1L, 11), (2L, 10), (2L, 11), (3L, 20)))
  }

  test("salted join spreads a hot key across salts partitions") {
    // all rows share ONE key: the unsalted join would put every row in one
    // hash partition; with salting the big side spans multiple salt values
    val big = (1 to 1000).map(i => (i.toLong, "hot")).toDF("id", "k")
    val small = Seq(("hot", 1)).toDF("k", "v")
    val salted = big.withColumn("__salt",
      pmod(xxhash64(col("id")), lit(8)).cast("int"))
    val saltsUsed = salted.select("__salt").distinct().count()
    assert(saltsUsed == 8, s"expected all 8 salts used, got $saltsUsed")
    assert(Skew.saltedJoin(big, small, Seq("k"), "id", 8).count() == 1000)
  }

  test("salted join plan joins on (key, salt) without broadcast") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val big = (1 to 100).map(i => (i.toLong, s"k${i % 3}")).toDF("id", "k")
      val small = (0 until 3).map(i => (s"k$i", i)).toDF("k", "v")
      val out = Skew.saltedJoin(big, small, Seq("k"), "id", 4)
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("__salt"), "join keys must include the salt")
      assert(!plan.contains("BroadcastHashJoin"),
        "broadcast disabled: the salted path must survive as a shuffle join")
      assert(out.count() == 100)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
