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

  test("fuzzyJoin equals brute force on random perturbed strings (property)") {
    // small alphabet + short lengths force near-collisions, duplicate
    // grams, and the short-string bucket (lengths 0..11 vs q up to 3)
    val rnd = new scala.util.Random(20260813L)
    val alpha = "abcde"
    def randStr(n: Int): String =
      (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    def edit(s: String): String = rnd.nextInt(3) match {
      case 0 if s.nonEmpty => // deletion
        val i = rnd.nextInt(s.length); s.substring(0, i) + s.substring(i + 1)
      case 1 => // insertion
        val i = rnd.nextInt(s.length + 1)
        s.substring(0, i) + alpha(rnd.nextInt(alpha.length)) + s.substring(i)
      case _ if s.nonEmpty => // substitution
        val i = rnd.nextInt(s.length)
        s.substring(0, i) + alpha(rnd.nextInt(alpha.length)) + s.substring(i + 1)
      case _ => s
    }
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val cur = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(a.length)
    }
    val rights = (0 until 120).map(i => (i.toLong, randStr(rnd.nextInt(12))))
    val lefts = (0 until 80).map { i =>
      val base = rights(rnd.nextInt(rights.length))._2
      (i.toLong, edit(edit(base)))
    }
    val lDf = lefts.toDF("id", "s")
    val rDf = rights.toDF("id", "s")
    for (d <- Seq(1, 2); q <- Seq(2, 3)) {
      val got = Joins.fuzzyJoin(lDf, rDf, "id", "s", "id", "s", d, q)
        .select("lid", "rid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (li, ls) <- lefts; (ri, rs) <- rights if lev(ls, rs) <= d
      } yield (li, ri)).toSet
      assert(got == want,
        s"d=$d q=$q: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
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
