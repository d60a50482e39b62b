package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  test("KMV estimate tracks exact distinct within ~10% at k=256") {
    val n = 50000
    val df = (1 to n).map(i => i % 7919).toDF("v") // 7919 distinct values
    val kmv = KmvSketch.kmvDistinct(256)
    val est = df.agg(kmv(col("v"))).head().getDouble(0)
    assert(math.abs(est - 7919) / 7919.0 < 0.10, s"estimate $est vs 7919")
  }

  test("KMV is exact below k and deterministic across partitionings") {
    val df = (1 to 100).toDF("v")
    val kmv = KmvSketch.kmvDistinct(256)
    val e1 = df.repartition(1).agg(kmv(col("v"))).head().getDouble(0)
    val e8 = df.repartition(8).agg(kmv(col("v"))).head().getDouble(0)
    assert(e1 == 100.0 && e8 == 100.0)
  }

  test("KMV per-group estimates work as a grouped aggregate") {
    // modulus coprime with the group count so every group sees all values
    val df = (1 to 10000).map(i => (i % 3, i % 500)).toDF("g", "v")
    val kmv = KmvSketch.kmvDistinct(256)
    val out = df.groupBy("g").agg(kmv(col("v")).as("d")).collect()
    assert(out.length == 3)
    out.foreach(r => assert(math.abs(r.getDouble(1) - 500) / 500.0 < 0.15))
  }
}
