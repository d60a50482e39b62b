package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-stream compaction (SCD-1 upsert semantics): from a union of
  * base snapshot + change batches, keep the LATEST record per key.
  *
  * The scale-right shape is a `max(struct(version..., payload...))`
  * AGGREGATION, not a row_number window: the agg combines map-side, so a
  * key with 10⁹ accumulated changes collapses inside each task before
  * the single shuffle on the key, while a window would sort the key's
  * entire history in one partition. This is the nightly "compact the
  * CDC log into the current table" pass — at 100 TB the difference
  * between a partial-agg shuffle of one row per key and sorting the
  * full log.
  *
  * `versionCols` order decides recency (later columns break ties of
  * earlier ones) and MUST end in a unique tiebreaker (a change-log
  * sequence number), so the payload columns — which sit after the
  * version columns inside the struct — never influence which record
  * wins, they just ride along.
  *
  * Reference semantics analog: repeated `update_rows` calls on a table
  * (seaserpent/base.py:693) leave the last write per row visible; this
  * is the same last-writer-wins rule applied to a log of writes in one
  * declarative pass.
  */
object Cdc {

  def latestByKey(log: DataFrame, keyCols: Seq[String],
                  versionCols: Seq[String],
                  payloadCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && versionCols.nonEmpty,
      "keyCols and versionCols must be non-empty")
    val ordered = (versionCols ++ payloadCols).map(col)
    val winner = log.groupBy(keyCols.map(col): _*)
      .agg(max(struct(ordered: _*)).as("__w"))
    (versionCols ++ payloadCols).foldLeft(winner) { (df, c) =>
      df.withColumn(c, col(s"__w.$c"))
    }.drop("__w")
  }
}
