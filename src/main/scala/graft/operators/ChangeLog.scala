package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-log / time-travel operators.
  *
  * The reference reconstructs historical table state by replaying SeaTable
  * activity logs: `Table.time_machine` (seaserpent/base.py:973) keeps, per
  * (row, column), the last log entry before the target date and patches the
  * current frame; `Table.fetch_row_logs` (base.py:1216) returns the ordered
  * per-row modification history.
  *
  * Spark-native: the log is just a keyed, timestamped table, and "state as
  * of T" is an as-of aggregation — for each key, the latest record with
  * ts <= T. Two physical shapes:
  *   - window row_number (one shuffle on key, sort within partition);
  *   - max_by(struct) grouped agg (partial aggregation, usually cheaper at
  *     scale because it map-side combines before the shuffle).
  * We use the grouped-agg shape for snapshots (scale-friendly) and the
  * window shape for ordered histories (where the full ordered list is the
  * output).
  */
object ChangeLog {

  /** State as of `asOf`: latest row per `key` with `ts <= asOf`, tie-broken
    * by `tieBreak` (highest wins, mirroring "last log entry wins",
    * base.py:1008 drop_duplicates(keep='last')).
    *
    * Implemented as max_by over a (ts, tieBreak) ordering struct: partial
    * aggregation combines map-side, so the shuffle carries one candidate per
    * key per partition — survives 100 TB logs with hot keys far better than
    * a row_number window. */
  def snapshotAsOf(log: DataFrame, key: String, ts: String, tieBreak: String,
                   asOf: Column, valueCols: Seq[String]): DataFrame = {
    val ord = struct(col(ts), col(tieBreak))
    val payload = struct((ts +: tieBreak +: valueCols).distinct.map(col): _*)
    log.filter(col(ts) <= asOf)
      .groupBy(col(key))
      .agg(max_by(payload, ord).as("__last"))
      .select(col(key) +: (ts +: tieBreak +: valueCols).distinct
        .map(c => col(s"__last.$c").as(c)): _*)
  }

  /** Ordered per-key history with a revision number — `fetch_row_logs`
    * analog. */
  def rowLogs(log: DataFrame, key: String, ts: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tieBreak))
    log.withColumn("rev", row_number().over(w))
  }
}
