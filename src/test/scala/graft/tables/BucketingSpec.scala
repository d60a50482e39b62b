package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed join runs with no ShuffleExchange on either side") {
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // disable broadcast so shuffle elimination is attributable to the
      // bucketed layout, and AQE so the initial physical plan is final
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val orders = Tables.orders(spark, sf())
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val customer = Tables.customer(spark, sf())
        .select("c_custkey", "c_name")
        .withColumnRenamed("c_custkey", "o_custkey")
      Bucketing.writeBucketed(orders, "b_orders", "o_custkey", 8)
      Bucketing.writeBucketed(customer, "b_customer", "o_custkey", 8)

      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_customer",
        "o_custkey")
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        s"bucketed join must not shuffle, found: $shuffles")

      // and it returns exactly what the unbucketed join returns
      val want = orders.join(customer, "o_custkey").count()
      assert(joined.count() == want)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("groupBy on the bucket key skips its Exchange too") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val orders = Tables.orders(spark, sf())
        .select("o_orderkey", "o_custkey", "o_totalprice")
      Bucketing.writeBucketed(orders, "b_orders_agg", "o_custkey", 8)
      val agg = spark.table("b_orders_agg").groupBy("o_custkey")
        .agg(count(lit(1)).as("n"))
      val shuffles = agg.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty, s"bucketed groupBy must not shuffle: $shuffles")
      assert(agg.count() ==
        orders.select("o_custkey").distinct().count())
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS b_orders_agg")
    }
  }

  test("directory partitioning prunes non-matching partitions at planning time") {
    val dir = java.nio.file.Files.createTempDirectory("part_prune").toString
    val docs = Tables.documents(spark, sf())
    Bucketing.writePartitioned(docs, dir, Seq("lang"))
    val back = spark.read.parquet(dir)
    val filtered = back.filter(col("lang") === "de")
    // the lang predicate must land in PartitionFilters (directory-level
    // pruning), NOT survive as a data filter over all partitions
    val scan = filtered.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec in plan"))
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "lang")),
      s"lang filter not in PartitionFilters: ${scan.partitionFilters}")
    // pruning changed the read set — the scan's numFiles metric counts
    // only the lang=de directory — and not the answer. collect() through
    // the SAME plan instance the scan was captured from, so its metrics
    // populate
    assert(filtered.collect().length ==
      docs.filter(col("lang") === "de").count())
    val deFiles = new java.io.File(dir, "lang=de").listFiles()
      .count(_.getName.endsWith(".parquet"))
    val allFiles = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).count(_.getName.endsWith(".parquet"))
    val read = scan.metrics("numFiles").value
    assert(read == deFiles && deFiles < allFiles,
      s"scan read $read files; lang=de holds $deFiles of $allFiles")
  }
}
