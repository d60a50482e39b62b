package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data LAYOUT clustering — Z-order (Morton-curve)
  * file assignment plus the zone-map report a writer would record
  * (Databricks Delta's OPTIMIZE ZORDER shape; Morton 1966). Linear
  * layouts cluster one dimension perfectly and leave every other
  * dimension scattered across all files; interleaving the bits of two
  * bucketized dimensions gives every dimension locality ~√nFiles, so
  * single-dimension predicates prune MOST files via their min/max zone
  * maps — the data-skipping primitive behind multi-dim filters at
  * 100 TB.
  *
  * Scale posture: dimension ranges come from ONE 1-row aggregate
  * broadcast back onto the scan (no sampling nondeterminism); bucket +
  * interleave are pure integer scan-side arithmetic inside whole-stage
  * codegen (shiftleft/and of builtin columns — no UDF); the file
  * assignment is the z-code's high bits (what a writer would
  * `repartitionByRange` on), and the report is one partial-agg groupBy
  * bounded at nFiles rows. Everything is integer ops — bit-identical
  * across engines, and the oracle replays the interleave unrolled.
  */
object Layout {

  /** Morton interleave of two `bits`-bit bucket ids: bit i of `x` lands
    * at position 2i, bit i of `y` at 2i+1. Disjoint targets, so the
    * combine is a plain sum — builtin shift/and columns, codegen'd. */
  def mortonCode(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 16, s"bits must be in [1,16], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Z-order the rows of `df` on two long dimensions and emit the
    * per-file zone-map report: file id (the z-code's top bits), row
    * count, and each dimension's min/max — the metadata a scan consults
    * to skip files. `bits` buckets per dimension (fixed-width integer
    * buckets over the broadcast global range), `nFiles` = 2^(2·bits −
    * fileShift) z-ranges. */
  def zorderReport(df: DataFrame, colA: String, colB: String,
                   bits: Int = 8, fileShift: Int = 8): DataFrame = {
    require(fileShift >= 0 && fileShift < 2 * bits,
      s"fileShift must be in [0, ${2 * bits}), got $fileShift")
    val stats = df.agg(
      min(col(colA)).as("__amin"), max(col(colA)).as("__amax"),
      min(col(colB)).as("__bmin"), max(col(colB)).as("__bmax"))
    val nb = 1L << bits
    // integer bucket = (v - min) * nb DIV (range + 1) — exact long
    // arithmetic (a double divide could round across a bucket edge)
    def bucket(c: String, lo: String, hi: String): Column =
      expr(s"(($c - $lo) * ${nb}L) DIV ($hi - $lo + 1L)")
    df.crossJoin(broadcast(stats))
      .withColumn("__ba", bucket(colA, "__amin", "__amax"))
      .withColumn("__bb", bucket(colB, "__bmin", "__bmax"))
      .withColumn("__z", mortonCode(col("__ba"), col("__bb"), bits))
      .withColumn("file_id", shiftright(col("__z"), fileShift))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_rows"),
        min(col(colA)).as(s"min_$colA"), max(col(colA)).as(s"max_$colA"),
        min(col(colB)).as(s"min_$colB"), max(col(colB)).as(s"max_$colB"))
  }

  /** How many of the report's files a single-dimension range predicate
    * must READ (its [lo, hi] overlaps the file's zone map) — the
    * data-skipping figure of merit a spec can compare across layouts. */
  def filesTouched(report: DataFrame, dim: String, lo: Long,
                   hi: Long): Long =
    report.filter(col(s"min_$dim") <= hi && col(s"max_$dim") >= lo).count()
}
