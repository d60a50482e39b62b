package graft.operators

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(edges: Seq[(Long, Long, Long)], parts: Int = 2) = {
    val df = edges.toDF("src", "dst", "w").repartition(parts)
    Graph.pagerank(df, "src", "dst", "w", iters = 10, damping = 0.85)
      .select(col("node").as[Long], col("rank").cast("double").as[Double])
      .collect().toMap
  }

  test("uniform cycle gives every node exactly 1/n") {
    val r = ranksOf(Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L)))
    assert(r.keySet == Set(1L, 2L, 3L))
    r.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-5, r.toString))
  }

  test("a node every other node points at ranks strictly highest") {
    // star into 9: sources split their vote between 9 and a backlink
    val edges = (1L to 8L).flatMap(u =>
      Seq((u, 9L, 3L), (u, (u % 8) + 1, 1L))) ++ Seq((9L, 1L, 1L))
    val r = ranksOf(edges)
    val top = r.maxBy(_._2)._1
    assert(top == 9L, s"expected hub 9 on top, got $r")
  }

  test("rank mass is conserved when no node is dangling (sum = 1)") {
    val edges = Seq((1L, 2L, 5L), (2L, 3L, 2L), (3L, 1L, 7L), (2L, 1L, 3L))
    val sum = ranksOf(edges).values.sum
    // decimal(28,6) state: per-round quantization loses < 1e-6 per node
    assert(math.abs(sum - 1.0) < 1e-4, s"rank mass $sum")
  }

  test("output is bit-identical under different partitionings") {
    val edges = (1L to 40L).flatMap { u =>
      Seq((u, u % 7 + 1, u % 3 + 1), (u % 7 + 1, u % 11 + 2, 2L))
    }
    assert(ranksOf(edges, parts = 1) == ranksOf(edges, parts = 7),
      "decimal-quantized contributions must make rounds order-independent")
  }

  test("tradeEdges conserves lineitem count and is nation-bounded") {
    val d = sf()
    val li = Tables.lineitem(spark, d)
    val e = Graph.tradeEdges(li, Tables.orders(spark, d),
      Tables.customer(spark, d), Tables.supplier(spark, d))
    val (nEdges, wSum) = e.agg(count(lit(1)), sum("w"))
      .as[(Long, Long)].head()
    assert(wSum == li.count(), "every lineitem lands in exactly one edge")
    assert(nEdges <= 25L * 25L, "adjacency must be nation-bounded")
  }

  test("triangle census: K4, a star hub, and random graphs vs brute force") {
    def stats(pairs: Seq[(Long, Long)]) =
      Graph.triangleStats(pairs.toDF("pa", "pb")).collect()(0)
    // K4: 4 triangles, 6 edges, wedges = 4 * C(3,2) = 12, clustering 1
    val k4 = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    val rk4 = stats(k4)
    assert((rk4.getLong(0), rk4.getLong(1), rk4.getLong(2), rk4.getLong(3),
      rk4.getDouble(4)) == ((4L, 6L, 12L, 4L, 1.0)))
    // messy input: duplicates, both orientations, self-loops — the
    // internal normalization (advisor r10) must reduce to the same K4
    val messy = k4 ++ k4.map(_.swap) ++ k4 ++ Seq((2L, 2L), (0L, 0L))
    val rmessy = stats(messy)
    assert((rmessy.getLong(0), rmessy.getLong(1), rmessy.getLong(2),
      rmessy.getLong(3), rmessy.getDouble(4)) == ((4L, 6L, 12L, 4L, 1.0)),
      "duplicate / reversed / self-loop edges must normalize away")
    // star: the max-degree hub owns every wedge, zero close
    val star = (1L to 30L).map(i => (0L, i))
    val rs = stats(star)
    assert(rs.getLong(3) == 0L && rs.getDouble(4) == 0.0)
    assert(rs.getLong(2) == 30L * 29L / 2)
    // random graphs vs driver brute force
    for (seed <- Seq(1, 42)) {
      val rnd = new scala.util.Random(seed)
      val es = Seq.fill(220)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter(p => p._1 != p._2)
        .map(p => (p._1 min p._2, p._1 max p._2)).distinct
      val eset = es.toSet
      val nodes = es.flatMap(p => Seq(p._1, p._2)).distinct.sorted
      var expect = 0L
      for (i <- nodes.indices; j <- i + 1 until nodes.size;
           k <- j + 1 until nodes.size) {
        val (a, b, c) = (nodes(i), nodes(j), nodes(k))
        if (eset((a, b)) && eset((b, c)) && eset((a, c))) expect += 1
      }
      val r = stats(es)
      assert(r.getLong(3) == expect, s"seed=$seed: ${r.getLong(3)} != $expect")
      assert(r.getLong(1) == es.size)
    }
  }

  test("DOULION estimate: deterministic sparsify, exact census on kept " +
    "edges, unbiased scaling") {
    // K30: 4060 true triangles, 435 edges
    val k30 = for (a <- 0L until 30L; b <- (a + 1) until 30L) yield (a, b)
    val edges = k30.toDF("pa", "pb")
    val est = Graph.triangleEstimate(edges).collect()(0)
    val (kept, sampled, estT, p) = (est.getLong(0), est.getLong(1),
      est.getDouble(2), est.getDouble(3))
    assert(p == 0.25)
    // the kept set is a deterministic function of (seed, edge): stable
    // under partitioning
    val est2 = Graph.triangleEstimate(edges.repartition(7)).collect()(0)
    assert(est2.getLong(0) == kept && est2.getLong(1) == sampled)
    // arithmetic contract: estimate = sampled / p^3 exactly
    assert(estT == math.rint(sampled / 0.015625 * 10) / 10)
    // sampling sanity: kept fraction near p, estimate within the
    // +-3-sigma band of the true count (deterministic values — this
    // documents the md5 draw is not pathological)
    assert(math.abs(kept / 435.0 - 0.25) < 0.07, s"kept=$kept")
    val sigma = math.sqrt(4060.0 / 0.015625)
    assert(math.abs(estT - 4060.0) < 3 * sigma, s"est=$estT")
    // the sampled census agrees with the full census restricted to the
    // kept edges
    val keptEdges = edges.filter(
      graft.operators.Sampling.hashKey("tri42",
        concat(col("pa").cast("string"), lit("|"),
          col("pb").cast("string"))) < lit("4000"))
    val full = Graph.triangleStats(keptEdges).collect()(0)
    assert(full.getLong(3) == sampled && full.getLong(1) == kept)
    // advisor r11: default-safe normalization — feeding BOTH orientations
    // plus duplicates must give the identical estimate (one md5 draw per
    // canonical edge, not one per orientation)
    val messy = edges.union(edges.select(col("pb").as("pa"),
      col("pa").as("pb"))).union(edges.limit(40))
    val estM = Graph.triangleEstimate(messy).collect()(0)
    assert(estM.getLong(0) == kept && estM.getLong(1) == sampled &&
      estM.getDouble(2) == estT)
  }

  test("node-sampled estimate equals the census of the surviving subgraph") {
    val li = graft.tables.Tables.lineitem(spark, sf("sf0.001"))
    val est = Graph.triangleEstimateNodeSampled(li, keepNum = 32768)
      .collect()(0)
    // determinism under partitioning
    val est2 = Graph.triangleEstimateNodeSampled(li.repartition(9),
      keepNum = 32768).collect()(0)
    assert(est.getLong(0) == est2.getLong(0) &&
      est.getLong(1) == est2.getLong(1))
    // arithmetic contract at p = 1/2
    assert(est.getDouble(3) == 0.5)
    assert(est.getDouble(2) ==
      math.rint(est.getLong(1) / 0.125 * 10) / 10)
    // equals the exact census run on the hash-surviving fact rows
    val kept = li.filter(Sampling.hashKey("tri42",
      org.apache.spark.sql.functions.col("l_partkey")) <
      org.apache.spark.sql.functions.lit("8000"))
    val census = Graph.triangleStats(Graph.coPurchaseEdges(kept)).collect()(0)
    assert(census.getLong(3) == est.getLong(1) &&
      census.getLong(1) == est.getLong(0))
  }
}
