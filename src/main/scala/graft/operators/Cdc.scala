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
  * earlier ones) and SHOULD end in a unique tiebreaker (a change-log
  * sequence number) so the winner is well-defined; payload columns are
  * carried by `max_by(payload, version)` and can never influence which
  * record wins (on a version tie the winner is unspecified, not
  * payload-decided).
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
    // max_by(payload, version): payloads ride along WITHOUT participating
    // in the ordering — a caller who forgets the unique tiebreaker gets a
    // tie-unspecified winner, never one silently decided by payload
    // values (and non-orderable payload types like map work). Both aggs
    // combine map-side like any max.
    val ord = struct(versionCols.map(col): _*)
    val winner =
      if (payloadCols.isEmpty)
        log.groupBy(keyCols.map(col): _*).agg(max(ord).as("__v"))
      else
        log.groupBy(keyCols.map(col): _*).agg(max(ord).as("__v"),
          max_by(struct(payloadCols.map(col): _*), ord).as("__p"))
    val withV = versionCols.foldLeft(winner) { (df, c) =>
      df.withColumn(c, col(s"__v.$c"))
    }
    payloadCols.foldLeft(withV) { (df, c) =>
      df.withColumn(c, col(s"__p.$c"))
    }.drop("__v", "__p")
  }

  /** MERGE-INTO semantics — apply a changelog of upsert/delete
    * operations to a snapshot (the Delta/Iceberg MERGE shape, and the
    * missing half of [[latestByKey]]: compaction alone cannot REMOVE a
    * key). Per key, the changelog's LATEST record wins (same
    * version-column contract as latestByKey — end in a unique
    * tiebreaker); if its `opCol` equals `deleteOp` the key disappears
    * from the result, otherwise its payload replaces the snapshot's.
    * Keys the log never touches pass through unchanged. A delete
    * followed by a later upsert re-inserts (the winner rule decides,
    * not the delete's presence).
    *
    * Scale posture: the log compacts FIRST via the map-side-combining
    * max/max_by aggregation (one shuffled row per touched key, never a
    * per-key history sort), then ONE full-outer equi-join on the key
    * against the snapshot — both sides hash-partition on the key, AQE
    * broadcasts a small compacted log. No window anywhere. */
  def mergeApply(snapshot: DataFrame, log: DataFrame, keyCols: Seq[String],
                 versionCols: Seq[String], opCol: String,
                 payloadCols: Seq[String], deleteOp: String = "D"): DataFrame = {
    require(!payloadCols.contains(opCol), "opCol rides separately from payload")
    val winners = latestByKey(log, keyCols, versionCols,
      payloadCols :+ opCol)
    val w = winners.select(
      keyCols.map(col) ++ (versionCols ++ payloadCols :+ opCol)
        .map(c => col(c).as(s"__w_$c")): _*)
    val joined = snapshot.join(w, keyCols, "full_outer")
      // a key whose latest log record is a delete vanishes — unless the
      // key only exists in the snapshot (null op = untouched)
      .filter(col(s"__w_$opCol").isNull || col(s"__w_$opCol") =!= deleteOp)
    val touched = col(s"__w_$opCol").isNotNull
    val out = (versionCols ++ payloadCols).foldLeft(joined) { (df, c) =>
      df.withColumn(c, when(touched, col(s"__w_$c")).otherwise(col(c)))
    }
    out.select(keyCols.map(col) ++ (versionCols ++ payloadCols).map(col): _*)
  }

  /** Snapshot DIFF — the audit report between two table states (what a
    * nightly pipeline publishes after [[mergeApply]]: which keys
    * appeared, vanished, or changed payload). One full-outer equi-join
    * on the key; change class is a scan-side CASE over null-sides and
    * payload equality (null-safe `<=>` per column — a payload going
    * null/non-null IS a change); `unchanged` keys are dropped (the
    * interesting rows at 100 TB are the delta, which is what should
    * leave the shuffle). */
  def snapshotDiff(before: DataFrame, after: DataFrame, keyCols: Seq[String],
                   payloadCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && payloadCols.nonEmpty,
      "keyCols and payloadCols must be non-empty")
    // presence flags ride each side INTO the full-outer join (payload
    // nulls alone can't distinguish "absent key" from "null payload")
    val b = before.select(
      keyCols.map(col) ++ payloadCols.map(c => col(c).as(s"__b_$c"))
        :+ lit(true).as("__in_b"): _*)
    val a = after.select(
      keyCols.map(col) ++ payloadCols.map(c => col(c).as(s"__a_$c"))
        :+ lit(true).as("__in_a"): _*)
    val bTouched = col(s"__b_${payloadCols.head}")
    val same = payloadCols.map(c =>
      col(s"__b_$c") <=> col(s"__a_$c")).reduce(_ && _)
    b.join(a, keyCols, "full_outer")
      .withColumn("change_type",
        when(col("__in_b").isNull, lit("added"))
          .when(col("__in_a").isNull, lit("removed"))
          .when(!same, lit("changed")))
      .filter(col("change_type").isNotNull)
      .select(keyCols.map(col) :+ col("change_type") :+
        bTouched.as("sample_before") :+
        col(s"__a_${payloadCols.head}").as("sample_after"): _*)
  }

  /** SCD Type 2 — the warehouse twin of [[latestByKey]]: instead of
    * keeping only the latest record, EVERY change becomes a version row
    * with a validity interval. `valid_from` is the change's own
    * timestamp; `valid_to` is the NEXT change's timestamp for the same
    * key (exclusive upper bound, the half-open-interval convention an
    * as-of lookup needs); the newest version has null `valid_to` and
    * `is_current = true`.
    *
    * One `lead()` window per key — a single shuffle on the key columns,
    * partitions bounded by per-key history length (per-key CDC history
    * is operationally bounded; a key with a truly unbounded history is
    * the pathology the compaction op exists to prevent). `orderCols`
    * decides version order: it should START with `tsCol` (or the
    * intervals won't tile the timeline) and END in a unique tiebreaker,
    * same contract as [[latestByKey]]'s versionCols. Emits epoch MICROS
    * for the bounds (integer-exact; formatting is the caller's
    * concern). */
  def scdType2(log: DataFrame, keyCols: Seq[String], tsCol: String,
               orderCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && orderCols.nonEmpty,
      "keyCols and orderCols must be non-empty")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    log
      .withColumn("valid_from_us", unix_micros(col(tsCol)))
      .withColumn("valid_to_us", lead(unix_micros(col(tsCol)), 1).over(w))
      .withColumn("is_current", col("valid_to_us").isNull)
  }
}
