package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway perf scratch — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("scratch").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    val D = org.apache.spark.sql.types.DataTypes.createDecimalType(28, 6)

    def time(tag: String)(f: => Unit): Unit = {
      // warm + 3 measured
      f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $tag%-22s median ${ts.sorted.apply(1)}%.3f s  (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }

    time("scan-count") { li.select(cols.map(col): _*).agg(count(lit(1))).collect() }

    time("moments-double") {
      val aggs = cols.flatMap { c =>
        Seq(count(col(c)), sum(col(c)), sum(col(c) * col(c)), min(col(c)), max(col(c)))
      }
      li.agg(count(lit(1)), aggs: _*).collect()
    }

    time("moments-decimal") {
      val aggs = cols.flatMap { c =>
        Seq(count(col(c)).as(s"__cnt_$c"),
          sum(col(c).cast(D)).cast("double").as(s"__s_$c"),
          sum((col(c) * col(c)).cast(D)).cast("double").as(s"__ss_$c"),
          min(col(c)).as(s"__min_$c"), max(col(c)).as(s"__max_$c"))
      }
      li.agg(count(lit(1)).as("__nr"), aggs: _*).collect()
    }

    val D18 = org.apache.spark.sql.types.DataTypes.createDecimalType(18, 6)
    time("moments-dec18") {
      val aggs = cols.flatMap { c =>
        Seq(count(col(c)).as(s"__cnt_$c"),
          sum(col(c).cast(D18)).cast("double").as(s"__s_$c"),
          sum((col(c) * col(c)).cast(D18)).cast("double").as(s"__ss_$c"),
          min(col(c)).as(s"__min_$c"), max(col(c)).as(s"__max_$c"))
      }
      li.agg(count(lit(1)).as("__nr"), aggs: _*).collect()
    }

    time("percentile-direct") {
      val qAggs = cols.map { c => expr(s"percentile($c, array(0.25, 0.5, 0.75))").as(s"__q_$c") }
      li.agg(qAggs.head, qAggs.tail: _*).collect()
    }

    time("percentile-1col-ep") {
      li.agg(expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))")).collect()
    }

    time("approx-direct") {
      val qAggs = cols.map { c => expr(s"approx_percentile($c, array(0.25, 0.5, 0.75), 10000)") }
      li.agg(qAggs.head, qAggs.tail: _*).collect()
    }

    graft.functions.GraftFunctions.ensureRegistered(spark)
    time("exactpct-native") {
      val qAggs = cols.map { c => expr(s"exact_percentile($c, array(0.25, 0.5, 0.75))").as(s"__q_$c") }
      li.agg(qAggs.head, qAggs.tail: _*).collect()
    }

    // value parity vs builtin
    val a = li.agg(expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))"),
      expr("percentile(l_quantity, 0.5)")).collect()(0)
    val b = li.agg(expr("exact_percentile(l_extendedprice, array(0.25, 0.5, 0.75))"),
      expr("exact_percentile(l_quantity, 0.5)")).collect()(0)
    println(s"[scratch] builtin: $a")
    println(s"[scratch] native : $b")

    import graft.functions.Dec6Micros.dec6Sum
    time("moments-dec6sum") {
      val aggs = cols.flatMap { c =>
        Seq(count(col(c)).as(s"__cnt_$c"),
          dec6Sum(col(c).cast("double")).as(s"__s_$c"),
          dec6Sum((col(c) * col(c)).cast("double")).as(s"__ss_$c"),
          min(col(c)).as(s"__min_$c"), max(col(c)).as(s"__max_$c"))
      }
      li.agg(count(lit(1)).as("__nr"), aggs: _*).collect()
    }
    val c1 = li.agg(
      sum(col("l_extendedprice").cast(D)).cast("double"),
      sum((col("l_extendedprice") * col("l_extendedprice")).cast(D)).cast("double"),
      sum(col("l_discount").cast(D)).cast("double")).collect()(0)
    val c2 = li.agg(
      dec6Sum(col("l_extendedprice").cast("double")),
      dec6Sum((col("l_extendedprice") * col("l_extendedprice")).cast("double")),
      dec6Sum(col("l_discount").cast("double"))).collect()(0)
    println(s"[scratch] decimal-sums: $c1")
    println(s"[scratch] dec6-sums  : $c2")
    println(s"[scratch] sums-equal : ${c1 == c2}")

    spark.stop()
  }
}
