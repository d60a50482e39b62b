package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object LinDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.tables.Tables.documents(spark, "/root/testdata/sf0.01")
    val planted = docs.withColumn("text",
      when(col("doc_id") % 3 === 0, coalesce(col("text"), lit("")))
        .otherwise(concat(coalesce(col("text"), lit("")), lit(" mk"), col("lang"))))
    // replicate linearLogisticManaged but dump w after each round
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val DecW = org.apache.spark.sql.types.DataTypes.createDecimalType(18, 6)
    val DecX = org.apache.spark.sql.types.DataTypes.createDecimalType(12, 0)
    val t = coalesce(col("text"), lit(""))
    val base = planted.select(col("doc_id"), col("lang").as("label"),
      when(col("lang") === "en", 1L).otherwise(0L).as("y"), t.as("__t"))
    val feats = base.select(col("doc_id"), col("y"),
        explode(concat(graft.operators.TextOps.tokens(col("__t")),
          graft.functions.GraftFunctions.word_ngrams(col("__t"), 2))).as("feat"))
      .withColumn("b", substring(md5(col("feat")), 1, 2))
    val x = feats.groupBy("doc_id", "b")
      .agg(count(lit(1)).cast(DecX).as("xc"), max("y").as("y"))
      .unionByName(base.select(col("doc_id"), lit("__bias").as("b"),
        lit(1L).cast(DecX).as("xc"), col("y"))).cache()
    val nDocs = base.count()
    val sigmoid = (z: org.apache.spark.sql.Column) =>
      lit(1.0) / (lit(1.0) + exp(-z.cast("double")))
    var w = x.select("b").distinct()
      .select(col("b"), lit(0.0).cast(DecW).as("w")).localCheckpoint()
    for (r <- 1 to 3) {
      val p = x.join(broadcast(w), Seq("b")).groupBy("doc_id")
        .agg(sum(col("w") * col("xc")).as("z"))
        .select(col("doc_id"), sigmoid(col("z")).cast(DecW).as("p"))
      val g = x.join(p, Seq("doc_id")).groupBy("b")
        .agg(sum((col("p") - col("y")) * col("xc")).as("g"))
      w = w.join(g, Seq("b"))
        .select(col("b"), (col("w").cast("double") -
          lit(0.5) * (col("g").cast("double") / lit(nDocs.toDouble)))
          .cast(DecW).as("w")).localCheckpoint()
      w.orderBy("b").collect().foreach(row =>
        println(s"R$r|${row.getString(0)}|${row.getDecimal(1).toPlainString}"))
      p.orderBy("doc_id").collect().foreach(row =>
        println(s"P$r|${row.getLong(0)}|${row.getDecimal(1).toPlainString}"))
    }
    spark.stop()
  }
}
