package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Throwaway experiment main for optimization-round measurements. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val modes: Seq[String] =
      if (args.length > 1) args.drop(1).toSeq else Seq("old")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val docs = graft.tables.Tables.documents(spark, sfDir)
      .withColumn("text",
        when(col("doc_id") % 3 === 0, coalesce(col("text"), lit("")))
          .otherwise(concat(coalesce(col("text"), lit("")),
            lit(" mk"), col("lang"))))
    val t = coalesce(col("text"), lit(""))
    val base = docs.select(col("doc_id").as("doc_id"),
      col("lang").as("label"),
      when(col("lang") === "en", 1L).otherwise(0L).as("y"), t.as("__t"))
    val feats = base.select(col("doc_id"), col("y"),
        explode(concat(graft.operators.TextOps.tokens(col("__t")),
          graft.functions.GraftFunctions.word_ngrams(col("__t"), 2))).as("feat"))
      .withColumn("b", substring(md5(col("feat")), 1, 3))
    val nDocs = time("nDocs count") { base.count() }
    val nParts = math.max(1L, nDocs / 20000L).toInt
    for (mode <- modes) {
    val baseP =
      if (mode == "old") base
      else base.repartition(
        math.max(spark.sparkContext.defaultParallelism, nParts), col("doc_id"))
    val featsP = baseP.select(col("doc_id"), col("y"),
        explode(concat(graft.operators.TextOps.tokens(col("__t")),
          graft.functions.GraftFunctions.word_ngrams(col("__t"), 2))).as("feat"))
      .withColumn("b", substring(md5(col("feat")), 1, 3))
    val xRaw = featsP.groupBy("doc_id", "b")
      .agg(count(lit(1)).as("xc"), max("y").as("y"))
      .unionByName(baseP.select(col("doc_id"), lit("__bias").as("b"),
        lit(1L).as("xc"), col("y")))
    val x = (mode match {
      case "old" => xRaw
      case "winsort" => xRaw.repartition(nParts, col("doc_id"))
        .sortWithinPartitions("doc_id")
      case _ => xRaw.repartition(nParts, col("doc_id"))
    }).persist(StorageLevel.MEMORY_AND_DISK)
    val DecSum = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val sigmoidOfMicros = (zm: org.apache.spark.sql.Column) =>
      lit(1.0) / (lit(1.0) + exp(-(zm.cast("double") / lit(1e6))))
    var state = time("state init") {
      x.select("b").distinct()
        .select(col("b"), lit(0L).as("wm"), lit(0L).as("um")).localCheckpoint()
    }
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (for (a <- si.completionTime; b <- si.submissionTime)
          yield a - b).getOrElse(-1L)
        println(f"[scratch]   stage ${si.stageId}%4d ${ms}%5d ms ${si.numTasks}%3d tasks")
      }
    }
    val wall0 = System.nanoTime()
    for (i <- 0 until 16) {
      if (false) spark.sparkContext.addSparkListener(listener)
      if (false) spark.sparkContext.removeSparkListener(listener)
      time(s"round $i") {
        val g = if (mode.startsWith("win")) {
          val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
          x.join(broadcast(state.select("b", "wm")), Seq("b"))
            .withColumn("zm", sum((col("wm") * col("xc")).cast(DecSum)).over(w))
            .withColumn("pm",
              round(sigmoidOfMicros(col("zm")) * lit(1e6)).cast("long"))
            .groupBy("b")
            .agg(sum(((col("pm") - col("y") * lit(1000000L)) * col("xc"))
              .cast(DecSum)).as("gm"))
        } else {
          val p = x.join(broadcast(state.select("b", "wm")), Seq("b"))
            .groupBy("doc_id")
            .agg(sum((col("wm") * col("xc")).cast(DecSum)).as("zm"))
            .select(col("doc_id"),
              round(sigmoidOfMicros(col("zm")) * lit(1e6)).cast("long").as("pm"))
          x.join(p, Seq("doc_id"))
            .groupBy("b")
            .agg(sum(((col("pm") - col("y") * lit(1000000L)) * col("xc"))
              .cast(DecSum)).as("gm"))
        }
        val upd = state.join(g, Seq("b"))
          .withColumn("um2",
            round(col("gm").cast("double") / lit(nDocs.toDouble) +
              lit(0.9) * col("um").cast("double")).cast("long"))
          .select(col("b"),
            round(col("wm").cast("double") -
              lit(0.05) * col("um2").cast("double")).cast("long").as("wm"),
            col("um2").as("um"))
        if (i == 8 && sys.env.contains("SCRATCH_EXPLAIN"))
          println(s"[scratch] [$mode] ROUND PLAN:\n" + upd.queryExecution
            .explainString(org.apache.spark.sql.execution.FormattedMode))
        state = upd.localCheckpoint()
      }
    }
    println(f"[scratch] [$mode] 16 rounds wall: ${(System.nanoTime() - wall0) / 1e9}%.3f s")
    // checksum so modes can be compared for bit-equality
    val chk = state.agg(sum(col("wm")), sum(abs(col("wm"))), count(lit(1))).collect()(0)
    println(s"[scratch] [$mode] state checksum: $chk")
    x.unpersist(blocking = true)
    }
    spark.stop()
  }
}
