package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup, Similarity, TextAnalysis}
import graft.tables.Tables

/** Throwaway experiment harness for oracle-izing the rows-only queries.
  * Not part of the library surface — deleted once the operating points are
  * locked in. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def rows(df: DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq

    for (d <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      println(s"=== $d ===")
      val docs = Tables.documents(spark, d)
        .withColumn("text", coalesce(col("text"), lit("")))

      // A. minhash recall vs exact ngram at tau=0.5 (same shingles w=3)
      val mh = rows(Dedup.minhashPairs(docs, "doc_id", "text", tau = 0.5))
      val ex = rows(Dedup.ngramJaccardPairs(docs, "doc_id", "text", w = 3,
        tau = 0.5, prefixFilter = false))
      println(s"A minhash=${mh.size} exact=${ex.size} equal=${mh == ex}")

      // E. curation-internal minhash at tau=0.8 on the gated+deduped corpus
      val base = docs.select(col("doc_id"), col("text"))
      val gated = base.select((col("doc_id") +: col("text") +:
          (TextAnalysis.langScoreCols(col("text")) ++
            TextAnalysis.qualityCols(col("text")))): _*)
        .filter(col("n_tokens") >= 10)
        .select("doc_id", "text")
      val exd = Dedup.exactRows(gated, "doc_id", "text")
      val mh8 = rows(Dedup.minhashPairs(exd, "doc_id", "text", tau = 0.8)
        .select("doc_a", "doc_b"))
      val ex8 = rows(Dedup.ngramJaccardPairs(exd, "doc_id", "text", w = 3,
        tau = 0.8, prefixFilter = false).select("doc_a", "doc_b"))
      println(s"E curation-mh=${mh8.size} exact=${ex8.size} equal=${mh8 == ex8}")

      // B. planted ANN: 10 scaled copies of each query vector
      val scales = Seq(1.1, 1.2, 1.3, 1.4, 1.5, 1.6, 1.7, 1.8, 1.9, 2.1)
      val e = Tables.embeddings(spark, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val planted = e.filter(col("vec_id") < 5)
        .select(col("vec_id"), col("embedding"),
          posexplode(array(scales.map(lit): _*)).as(Seq("j", "s")))
        .select((lit(100000) + col("vec_id") * 100 + col("j")).as("vec_id"),
          transform(col("embedding"), x => x * col("s")).as("embedding"))
      val corpus = e.unionByName(planted)
      val qids = Seq(0L, 1L, 2L, 3L, 4L)
      val brute = rows(Similarity.annTopK(corpus, "vec_id", "embedding", qids, 10))
      val lsh = rows(Similarity.annLsh(corpus, "vec_id", "embedding", qids, 10))
      val ivf = rows(Similarity.annIvf(corpus, "vec_id", "embedding", qids, 10))
      println(s"B lsh==brute=${lsh == brute} ivf==brute=${ivf == brute}")
      if (lsh != brute) println("  lsh diff: " +
        (brute.toSet -- lsh.toSet).take(3) + " | " + (lsh.toSet -- brute.toSet).take(3))
      if (ivf != brute) println("  ivf diff: " +
        (brute.toSet -- ivf.toSet).take(3) + " | " + (ivf.toSet -- brute.toSet).take(3))

      // C. approx quantiles determinism: print both exact and approx
      val o = Tables.orders(spark, d)
      println("C approx: " + rows(o.groupBy("o_orderstatus")
        .agg(expr("approx_percentile(o_totalprice, 0.5, 10000)").as("m"),
          expr("approx_percentile(o_totalprice, 0.9, 10000)").as("p"),
          count(lit(1)).as("n")).orderBy("o_orderstatus")).mkString(" | "))

      // D. simhash signatures of first 3 docs (to cross-check DuckDB fold)
      graft.functions.GraftFunctions.ensureRegistered(spark)
      println("D sims: " + rows(docs.filter(col("doc_id") < 3)
        .select(col("doc_id"),
          graft.functions.GraftFunctions.simhash64(
            graft.operators.TextOps.tokens(col("text"))).as("sig"))
        .orderBy("doc_id")).mkString(" "))
      // D2. simhash pair count at maxHamming=3 (pigeonhole-complete point)
      println("D2 pairs@3: " + Dedup.simhashPairs(docs, "doc_id", "text",
        maxHamming = 3).count())
    }
    spark.stop()
  }
}
