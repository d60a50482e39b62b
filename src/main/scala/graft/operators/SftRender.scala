package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Chat-template rendering with loss-mask spans — the last mile of SFT
  * data prep: a conversation (ordered turns with alternating roles) is
  * rendered into one training string under a fixed template, and the
  * character spans of the ASSISTANT contents are emitted so the trainer
  * can mask the loss to completion tokens only.
  *
  * Template (ChatML-shaped, fixed):
  *   segment(i) = header(i) || content(i) || "\n"
  *   header(i)  = "<|user|>\n"  for even turn_idx, "<|assistant|>\n" odd
  * rendered = concat of segments in (ts, event_id) order; a mask span is
  * [offset_i + len(header_i), offset_i + len(header_i) + len(content_i))
  * for every assistant turn, offsets cumulative over prior segments.
  *
  * Conversations are synthesized from the events table: one conversation
  * per user_id, turns are the user's events in (ts, event_id) order,
  * content is "event_type <event_id mod 1000>" (integers only — no float
  * formatting divergence between engines).
  *
  * Scale shape: the mask query is window sums over (user, ts, event_id) —
  * one shuffle, no row blowup. The render query assembles each
  * conversation with sort_array(collect_list(struct(...))) — bounded by
  * conversation length (the inherent shape: a training example must see
  * all its turns), one shuffle on user_id.
  */
object SftRender {

  val UserHeader = "<|user|>\n"
  val AssistantHeader = "<|assistant|>\n"

  /** Per-turn projection: (user, ts, event_id, content). */
  private def turns(events: DataFrame): DataFrame =
    events.select(col("user_id"), col("ts"), col("event_id"),
      concat(col("event_type"), lit(" "),
        pmod(col("event_id"), lit(1000)).cast("string")).as("content"))

  private def headerLen(turnIdx: Column): Column =
    when(pmod(turnIdx, lit(2)) === 0, lit(UserHeader.length))
      .otherwise(lit(AssistantHeader.length))

  /** Loss-mask spans: one row per ASSISTANT turn with the half-open
    * character span [start_pos, end_pos) of its content inside the
    * rendered string. Pure window arithmetic — never materializes the
    * rendered text. */
  def maskSpans(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val turnIdx = (row_number().over(w) - 1).as("turn_idx")
    val segLen = (headerLen(col("turn_idx")) + length(col("content")) + 1)
      .as("seg_len")
    val base = turns(events).select(col("user_id"), col("ts"),
      col("event_id"), col("content"), turnIdx)
    val withLen = base.withColumn("seg_len", segLen)
    val offset = coalesce(
      sum(col("seg_len")).over(
        Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
    withLen
      .withColumn("start_pos", offset + headerLen(col("turn_idx")))
      .where(pmod(col("turn_idx"), lit(2)) === 1)
      .select(col("user_id"), col("turn_idx"),
        col("start_pos").cast("long").as("start_pos"),
        (col("start_pos") + length(col("content"))).cast("long").as("end_pos"))
  }

  /** Rendered-conversation readout: (user_id, n_turns, n_chars_r,
    * rendered_md5). The md5 keeps the oracle row narrow while still
    * certifying the rendered string byte-for-byte. */
  def render(events: DataFrame): DataFrame = {
    val segs = transform(col("turns"), (t, i) =>
      concat(
        when(pmod(i, lit(2)) === 0, lit(UserHeader)).otherwise(lit(AssistantHeader)),
        t.getField("content"), lit("\n")))
    turns(events)
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("ts"), col("event_id"),
        col("content")))).as("turns"))
      .withColumn("rendered", array_join(segs, ""))
      .select(col("user_id"),
        size(col("turns")).as("n_turns"),
        length(col("rendered")).as("n_chars_r"),
        md5(col("rendered")).as("rendered_md5"))
  }
}
