package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("morton interleave on known bit patterns") {
    val df = Seq((5L, 3L), (0L, 0L), (255L, 0L), (0L, 255L))
      .toDF("x", "y")
      .select(Layout.mortonCode(col("x"), col("y"), 8).as("z"))
    // x=101b, y=011b -> y2x2 y1x1 y0x0 = 011011b = 27;
    // x bits fill even positions (0x5555), y bits odd (0xAAAA)
    assert(df.as[Long].collect().toSeq == Seq(27L, 0L, 0x5555L, 0xAAAAL))
  }

  test("z-order files prune BOTH dimensions; a linear layout prunes one") {
    val li = graft.tables.Tables.lineitem(spark, sf("sf0.001"))
    val z = Layout.zorderReport(li, "l_partkey", "l_suppkey").cache()
    val nFiles = z.count()
    // zone maps are well-formed and the report partitions the table
    assert(z.filter(col("min_l_partkey") > col("max_l_partkey") ||
      col("min_l_suppkey") > col("max_l_suppkey")).count() == 0L)
    assert(z.agg(sum("n_rows")).as[Long].collect()(0) == li.count())

    // the linear baseline: 256 files clustered on l_partkey alone
    val stats = li.agg(min("l_suppkey"), max("l_suppkey"),
      min("l_partkey"), max("l_partkey")).collect()(0)
    val (sLo, sHi) = (stats.getLong(0), stats.getLong(1))
    val (pLo, pHi) = (stats.getLong(2), stats.getLong(3))
    val linear = li.crossJoin(broadcast(li.agg(
        min(col("l_partkey")).as("__amin"), max(col("l_partkey")).as("__amax"))))
      .withColumn("file_id",
        expr("((l_partkey - __amin) * 256L) DIV (__amax - __amin + 1L)"))
      .groupBy("file_id")
      .agg(min(col("l_suppkey")).as("min_l_suppkey"),
        max(col("l_suppkey")).as("max_l_suppkey"),
        min(col("l_partkey")).as("min_l_partkey"),
        max(col("l_partkey")).as("max_l_partkey")).cache()

    // a 10%-of-domain predicate on the SECOND dimension
    val width = (sHi - sLo + 1) / 10
    val (qLo, qHi) = (sLo + 4 * width, sLo + 5 * width)
    val zTouched = Layout.filesTouched(z, "l_suppkey", qLo, qHi)
    val linTouched = Layout.filesTouched(linear, "l_suppkey", qLo, qHi)
    // linear-on-partkey cannot skip suppkey predicates; z-order can
    assert(linTouched * 10 >= linear.count() * 9,
      s"linear should read ~all files, read $linTouched of ${linear.count()}")
    assert(zTouched * 3 <= nFiles,
      s"z-order should skip most files, read $zTouched of $nFiles")
    // and the FIRST dimension still prunes under z-order
    val pWidth = (pHi - pLo + 1) / 10
    val zTouchedP = Layout.filesTouched(z, "l_partkey",
      pLo + 4 * pWidth, pLo + 5 * pWidth)
    assert(zTouchedP * 3 <= nFiles,
      s"z-order should prune dim A too, read $zTouchedP of $nFiles")
  }
}
