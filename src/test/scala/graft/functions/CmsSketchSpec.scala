package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CmsSketchSpec extends SparkSpec {
  import spark.implicits._

  private val D = 4
  private val W = 256

  /** Driver-side estimate from a collected sketch — the same
    * seeded-FNV bucket walk the aggregator uses. */
  private def estimate(cms: Array[Long], key: String): Long = {
    val bytes = key.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    (0 until D).map { i =>
      val h = SimHash64Impl.fnv1a64(bytes, CmsSketch.basisFor(i))
      cms(i * W + (h & (W - 1)).toInt)
    }.min
  }

  test("cms: est >= true for every key, exact on a clean sketch, " +
       "partition-invariant") {
    // skewed multiset: key k appears k times (1..60), plus a hot key
    val rows = (1 to 60).flatMap(k => Seq.fill(k)(s"k$k")) ++
      Seq.fill(500)("hot")
    val df = rows.toDF("t")
    val a1 = df.agg(CmsSketch.cms(D, W)(col("t"))).head().getSeq[Long](0).toArray
    val a2 = df.repartition(13).agg(CmsSketch.cms(D, W)(col("t")))
      .head().getSeq[Long](0).toArray
    assert(a1.sameElements(a2),
      "elementwise-sum merge must make the sketch partition-invariant")
    assert(a1.sum == D.toLong * rows.length,
      "every row must increment exactly d buckets")
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    truth.foreach { case (k, n) =>
      assert(estimate(a1, k) >= n, s"CMS lower bound violated for $k")
    }
    assert(estimate(a1, "hot") >= 500L)
  }

  test("cms rejects a non-power-of-two width") {
    intercept[IllegalArgumentException] { new CmsSketch(4, 1000) }
  }
}
