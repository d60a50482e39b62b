package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish stream: token "t0" appears 5000×, "t1" 2500×, …, plus a
    * long tail of singletons. n = 5000+2500+1250+625 + 5000 tail. */
  private def zipfToks = {
    val head = (0 until 4).flatMap(i => Seq.fill(5000 >> i)(s"t$i"))
    val tail = (0 until 5000).map(i => s"x$i")
    (head ++ tail).toDF("tok")
  }

  test("MG sketch recall: every item above n/(k+1) is present") {
    val df = zipfToks
    val n = df.count()
    val sk = df.agg(HeavyHitters.mgSketch(64)(col("tok"))).head()
      .getMap[String, Long](0)
    val thresh = n / 65.0
    // true counts above threshold: t0..t3 (625 > 14375/65 ≈ 221)
    for (i <- 0 until 4)
      assert(sk.contains(s"t$i"), s"t$i (count ${5000 >> i}) missing from sketch")
    assert(sk.size <= 64)
    // sanity on the bound itself
    assert((5000 >> 3) > thresh)
  }

  test("MG recall guarantee holds across partitionings (merge path)") {
    for (parts <- Seq(1, 7, 32)) {
      val sk = zipfToks.repartition(parts)
        .agg(HeavyHitters.mgSketch(16)(col("tok"))).head()
        .getMap[String, Long](0)
      for (i <- 0 until 4)
        assert(sk.contains(s"t$i"), s"parts=$parts: t$i missing")
      assert(sk.size <= 16, s"parts=$parts: ${sk.size} counters")
    }
  }

  test("MG undercount is bounded by n/(k+1)") {
    val df = zipfToks
    val n = df.count()
    val k = 32
    val sk = df.repartition(8).agg(HeavyHitters.mgSketch(k)(col("tok")))
      .head().getMap[String, Long](0)
    val err = n.toDouble / (k + 1)
    for (i <- 0 until 4) {
      val truth = 5000 >> i
      sk.get(s"t$i").foreach { c =>
        assert(c <= truth, s"t$i overcounts: $c > $truth")
        assert(c >= truth - err, s"t$i undercounts past bound: $c < $truth - $err")
      }
    }
  }

  test("sketch is exact when distinct items fit in k") {
    val df = Seq("a", "a", "a", "b", "b", "c").toDF("tok")
    val sk = df.agg(HeavyHitters.mgSketch(8)(col("tok"))).head()
      .getMap[String, Long](0)
    assert(sk == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("grouped heavy hitters: one sketch per group") {
    val df = (1 to 3000).map(i => (i % 2, if (i % 3 == 0) "hot" else s"c$i"))
      .toDF("g", "tok")
    val out = df.groupBy("g").agg(HeavyHitters.mgSketch(16)(col("tok")).as("sk"))
      .collect()
    assert(out.length == 2)
    out.foreach(r => assert(r.getMap[String, Long](1).contains("hot")))
  }
}
