package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.tables.Tables

/** Fourth-decade profile of q_text_fingerprint (judge r11 ask #5): the
  * row measured 1191x at 1000x data — ~1.19x over the linear floor a
  * fixed-core scan op expects. This probe decomposes the plan at an
  * arbitrary SPARK_GRAFT_SF_DIR into its candidate costs, each as its
  * own noop-write job over the same cached-footer scan:
  *
  *   - `scan_length`   — parquet scan + a trivial projection (the I/O floor)
  *   - `norm_only`     — the NFC/lower/strip normalization alone
  *   - `md5_only`      — normalization + md5
  *   - `roll_only`     — normalization + the native rolling-hash fold
  *   - `fp_noorder`    — the full fingerprint projection, NO output sort
  *   - `fp_orderby`    — the registered query shape (global doc_id range sort)
  *
  * fp_orderby - fp_noorder isolates the cosmetic output sort (range
  * exchange of (id, 2 hashes)); fp_noorder - scan_length is the
  * irreducible per-byte compute. Prints one JSON line for the round's
  * evidence file.
  */
object FingerprintProbe {
  private def timeOf(df: DataFrame): Double = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val docs = Tables.documents(spark, sfDir)
      .withColumn("text", coalesce(col("text"), lit("")))
    val norm = graft.operators.TextOps.normalize(col("text"))
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "scan_length" -> (() => docs.select(col("doc_id"), length(col("text")))),
      "norm_only" -> (() => docs.select(col("doc_id"), length(norm).as("n"))),
      "md5_only" -> (() => docs.select(col("doc_id"), md5(norm).as("fp_md5"))),
      "roll_only" -> (() => docs.select(col("doc_id"),
        graft.functions.GraftFunctions.rolling_hash(norm).as("fp_roll"))),
      "fp_noorder" -> (() =>
        TextAnalysis.fingerprint(docs, "doc_id", "text")),
      "fp_orderby" -> (() =>
        TextAnalysis.fingerprint(docs, "doc_id", "text").orderBy("doc_id")),
      // the fix shipped from this probe's r12 measurement: range
      // exchange on the raw scan BEFORE the projection — the sampling
      // pass stops re-running the normalize+hash chain
      "fp_rangefirst" -> (() =>
        TextAnalysis.fingerprintOrdered(docs, "doc_id", "text")))
    // SPARK_GRAFT_PROBE_ONLY=a,b subsets the variants (re-measure runs)
    val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY").map(_.split(",").toSet)
    val picked = variants.filter(v => only.forall(_.contains(v._1)))
    // one warm pass (footers + codegen), then the measured pass
    timeOf(variants.head._2())
    val times = picked.map { case (name, mk) => name -> timeOf(mk()) }
    println(times.map { case (n, t) => s""""$n":${f"$t%.2f"}""" }
      .mkString("{\"probe\":\"q_text_fingerprint\",\"sfDir\":\"" + sfDir + "\",", ",", "}"))
    spark.stop()
  }
}
