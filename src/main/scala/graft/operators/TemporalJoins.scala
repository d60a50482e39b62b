package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks as builtins: as-of and banded range join.
  *
  * Both follow the prompt's preference order: the semantics ARE
  * expressible by composing existing operators, so no custom
  * LogicalPlan/SparkStrategy is needed —
  *   - as-of = union both sides, one window pass per key carrying the
  *     last-seen right payload (one shuffle on key, no per-row probing);
  *   - range join = bucketize time into tolerance-width bins, explode one
  *     side ±1 bin, equi-join on (key, bin), filter the exact band. The
  *     equi-join shape is what survives scale — a naive θ-join degrades
  *     to BroadcastNestedLoop.
  */
object TemporalJoins {

  /** As-of join: for each left row, the single latest right row of the
    * same `key` with `rightTs <= leftTs` (ties on equal ts match, like
    * DuckDB/kdb ASOF). `rightCols` are carried; null when no prior right
    * row exists (left-join semantics).
    *
    * The right side must be unique per (key, ts) — pre-aggregate it if
    * not, or the carried row at a tied ts is unspecified.
    *
    * Union trick: tag left=1/right=0, sort each key partition by
    * (ts, tag) so a right row at ts T precedes left rows at T, then
    * `last(payload, ignoreNulls)` over rows-unbounded-preceding carries
    * the latest right payload into every left row. One shuffle total.
    *
    * Hot-key ceiling: the window partitions by `key`, and AQE's skew
    * mitigation applies to shuffle JOINS, not window partitions — one
    * hot key therefore lands in ONE task and is processed by a single
    * core's sort+scan (disk-spillable, so it completes — see the skew
    * spec — but it serializes). If one entity owns a double-digit share
    * of 100 TB, pre-split the key range (e.g. carry per-shard asof state
    * and merge) or bound per-key history upstream. The same ceiling
    * applies to any per-key window (q_topk_per_group, sessionize). */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               rightCols: Seq[String]): DataFrame = {
    val lTagged = left.withColumn("__tag", lit(1))
      .withColumn("__rpayload", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          rightCols.map(c => org.apache.spark.sql.types.StructField(c,
            right.schema(c).dataType)))))
    val rTagged = right.select(
      (Seq(col(key), col(ts)) :+ struct(rightCols.map(col): _*).as("__rpayload")): _*)
      .withColumn("__tag", lit(0))
    val lCols = left.columns
    val unioned = lTagged.select(
        (lCols.map(col) :+ col("__tag") :+ col("__rpayload")): _*)
      .unionByName(rTagged.select(
        (Seq(col(key), col(ts)) ++ lCols.filterNot(c => c == key || c == ts)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          Seq(col("__tag"), col("__rpayload"))): _*))
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__asof", last(col("__rpayload"), ignoreNulls = true).over(w))
    val out = carried.filter(col("__tag") === 1)
      .select((lCols.map(col) ++
        rightCols.map(c => col(s"__asof.$c").as(s"asof_$c"))): _*)
    out
  }

  /** Banded range join: all pairs of left/right rows sharing `key` whose
    * timestamps differ by at most `toleranceSec`. Left rows are exploded
    * to their bin ±1 (bin width = tolerance), the join is an equi-join on
    * (key, bin) — each qualifying pair matches exactly once because the
    * right row's own bin is unique. */
  def bandedRangeJoin(left: DataFrame, right: DataFrame, key: String,
                      leftTs: String, rightTs: String,
                      toleranceSec: Long): DataFrame = {
    val tolUs = toleranceSec * 1000000L
    val lb = left.withColumn("__bin", expr(s"unix_micros($leftTs) div $tolUs"))
      .withColumn("__jb", explode(array(col("__bin") - 1, col("__bin"), col("__bin") + 1)))
      .drop("__bin")
    val rb = right.withColumn("__jb", expr(s"unix_micros($rightTs) div $tolUs"))
    lb.join(rb, Seq(key, "__jb"))
      .filter(abs(unix_micros(col(leftTs)) - unix_micros(col(rightTs))) <= tolUs)
      .drop("__jb")
  }
}
