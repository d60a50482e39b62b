package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin returns exactly the plain-join result under skew") {
    // 90% of fact rows share one hot key
    val fact = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, i))
      .toDF("k", "payload")
    val dim = Seq((1L, "hot"), (950L, "cold")).toDF("dk", "name")
    val plain = fact.join(dim, col("k") === col("dk")).drop("dk")
      .orderBy("payload").collect().toSeq
    val salted = Joins.saltedJoin(fact, dim, "k", "dk", salts = 8).drop("dk")
      .orderBy("payload").collect().toSeq
    assert(salted == plain)
    assert(salted.size == 901)
  }

  test("saltedJoin rejects dim-preserving join types") {
    val fact = Seq((1L, 1)).toDF("k", "p")
    val dim = Seq((1L, "x")).toDF("dk", "n")
    intercept[IllegalArgumentException] {
      Joins.saltedJoin(fact, dim, "k", "dk", salts = 4, how = "right")
    }
    intercept[IllegalArgumentException] {
      Joins.saltedJoin(fact, dim, "k", "dk", salts = 4, how = "full_outer")
    }
  }

  test("bucketed tables join without a shuffle exchange") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = (1 to 500).map(i => (i.toLong, s"a$i")).toDF("k", "va")
      val b = (1 to 500).map(i => (i.toLong, s"vb$i")).toDF("k", "vb")
      Joins.writeBucketed(a, "bkt_a", "k", 4)
      Joins.writeBucketed(b, "bkt_b", "k", 4)
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join:\n$plan")
      assert(joined.count() == 500)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
