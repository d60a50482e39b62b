package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
object Bench {
  /** Execute the full plan without keeping results. A noop-format write
    * evaluates every measured expression: `.count()` would let Catalyst
    * prune projections an aggregate doesn't need (so projection-heavy
    * queries would time a plan that never runs their expressions). */
  private def run(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: JIT/codegen caches + first-touch parquet footers, so the
    // per-query numbers measure the plans rather than JVM startup.
    Seq("q1_agg", "q_text_tokens", "q_events_window", "q_ann_topk")
      .foreach(n => SparkEntry.queries.get(n)
        .foreach(f => try run(f(spark, sfDir)) catch { case _: Throwable => () }))
    var failed = List.empty[String]
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try run(fn(spark, sfDir)) catch {
        case e: Throwable =>
          // a broken query must surface as a bench failure, not a fast number
          System.err.println(s"BENCH FAIL $name: $e")
          e.printStackTrace()
          failed ::= name
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","failed":$errs}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
