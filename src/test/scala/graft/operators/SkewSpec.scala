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

  test("AQE splits the hot partition of a skewed fact-fact sort-merge join") {
    // SURVEY §4 claims runtime skew handling beyond manual salting: prove
    // it. One key carries ~50k rows (≫ every other partition and the
    // lowered skew threshold); with broadcast off the planner commits to
    // a sort-merge join, and AQE's OptimizeSkewedJoin must split the hot
    // partition at runtime — visible as skew=true on the executed join.
    val keep = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val left = ((1 to 50000).map(i => (1L, i.toLong)) ++
        (1 to 1000).map(i => ((i % 50).toLong + 2, i.toLong)))
        .toDF("k", "lv")
      val right = (1 to 52).flatMap(k => (1 to 5).map(r => (k.toLong, r)))
        .toDF("k", "rv")
      val j = left.join(right, Seq("k"))
      // execute THIS QueryExecution (count() would plan a fresh one and
      // leave j's adaptive plan unfinalized)
      // 50000 hot-key rows × 5 matches + 1000 tail rows × 5
      assert(j.collect().length == 50000 * 5 + 1000 * 5)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"),
        s"fact-fact join must be sort-merge here\n$plan")
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed partition\n$plan")
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("skewReport: closed-form entropy/top-share on a known histogram, " +
       "one scan, partitioning-invariant") {
    import spark.implicits._
    // hot: 6 of 8 rows share one value (top_share .75); uniform: 8
    // distinct values (entropy ln 8, top_share .125)
    val df = ((1 to 6).map(i => ("hot", i.toLong)) ++
      Seq(("warm", 7L), ("cool", 8L)))
      .toDF("k", "id")
    val out = Skew.skewReport(df, Seq("k", "id"))
      .collect().map(r => r.getString(0) -> r).toMap
    val k = out("k")
    assert(k.getAs[Long]("n") == 8 && k.getAs[Long]("n_distinct") == 3)
    assert(k.getAs[String]("top_value") == "hot")
    assert(k.getAs[Double]("top_share") == 0.75)
    // H = ln(8) - q6(6 ln 6)/8 (counts of 1 contribute ln 1 = 0)
    val expectH = math.log(8.0) - BigDecimal(6.0 * math.log(6.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble / 8.0
    assert(math.abs(k.getAs[Double]("entropy") - expectH) < 1e-6,
      s"entropy ${k.getAs[Double]("entropy")} vs $expectH")
    val id = out("id")
    assert(id.getAs[Long]("n_distinct") == 8 &&
      id.getAs[Double]("top_share") == 0.125)
    // uniform column: H = ln(n_distinct) exactly (all c = 1)
    assert(math.abs(id.getAs[Double]("entropy") - math.log(8)) < 1e-5)
    // single scan feeds both columns' histograms
    val plan = Skew.skewReport(df, Seq("k", "id"))
      .queryExecution.executedPlan.toString
    val scans = "(?i)localtablescan".r.findAllIn(plan).size
    assert(scans == 1, s"skewReport must be ONE scan, got $scans")
    val rep = Skew.skewReport(df.repartition(13), Seq("k", "id"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("entropy")).toMap
    assert(rep("k") == k.getAs[Double]("entropy"),
      "entropy must be bit-stable under partitioning")
  }

  test("SkewProbe three-way decade probe: 40%-hot key, AQE splits, all " +
       "paths agree (BENCH_skew_r11.json records the 100x measurements)") {
    // the same probe graft.tools.SkewProbe runs at the scaled decades
    // (BENCH_skew_r11.json records the 100x/1000x rows), exercised here
    // at sf0.01 with the skew threshold scaled down to the fixture
    // (shuffle blocks are compressed, so absolute bytes shrink with the
    // data) and mapTasks restoring the map-side parallelism AQE needs —
    // a skewed reduce partition splits along MAP-output boundaries, so
    // a one-row-group fixture (one mapper) has nothing to subdivide
    val r = graft.tools.SkewProbe.run(spark, sf("sf0.01"),
      skewThreshold = "2KB", mapTasks = Some(16))
    assert(math.abs(r.hotShare - 0.4) < 0.01, s"hot share ${r.hotShare}")
    assert(r.nJoin == r.nBig * 5, "every row matches exactly the 5-fan")
    assert(r.aqeSplit,
      "AQE must split the over-threshold hot partition (skew=true)")
  }
}
