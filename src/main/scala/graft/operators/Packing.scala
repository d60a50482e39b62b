package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining (SURVEY.md §2.2): lay documents
  * end-to-end into a token stream and cut fixed-budget context windows —
  * the standard "concat-and-chunk" batching (documents may span a chunk
  * boundary; training masks attention across the seam).
  *
  * Scale design: a single global concatenation order would need one
  * total-order window — a serial bottleneck. Instead rows are first
  * assigned to `buckets` independent streams (bucket = id mod buckets),
  * and packing runs per bucket: ONE shuffle on the bucket key, each
  * bucket's cumulative-sum window is an independent task, and doubling
  * the cluster just means raising `buckets`. Chunk ids are globally
  * unique as (bucket, chunk_id) pairs. Within a bucket the layout is a
  * pure function of (id order, token counts) — deterministic across
  * cluster layouts and re-runs.
  *
  * The reference has no packing surface; this is part of the
  * beyond-reference training-pipeline family.
  */
object Packing {

  /** Pack documents into `budget`-token context windows within
    * `buckets` parallel streams. Output per (non-empty) document:
    * bucket, tok_start (offset in the bucket's concatenated stream),
    * chunk_id = tok_start div budget, chunks_spanned (how many windows
    * the document crosses). Token counts are whitespace tokens counted
    * scan-side (`regexp_count` — the token array is never materialized).
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    budget: Int, buckets: Int): DataFrame = {
    require(budget > 0 && buckets > 0,
      s"budget/buckets must be positive, got ($budget, $buckets)")
    val id = col(idCol)
    val nTok = regexp_count(coalesce(col(textCol), lit("")), lit("\\S+"))
    val w = Window.partitionBy(col("bucket")).orderBy(id)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(id.as("doc_id"), (id % buckets).as("bucket"),
        nTok.cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("tok_start", sum(col("n_tokens")).over(w) - col("n_tokens"))
      // integer `div`, not fp `/`: offsets in a 100 TB stream can pass
      // 2^53 where double division starts rounding
      .withColumn("chunk_id", expr(s"tok_start div $budget"))
      .withColumn("chunks_spanned",
        expr(s"(tok_start + n_tokens - 1) div $budget") - col("chunk_id") + 1)
  }

  /** The inverse of [[packSequences]]: cut LARGE documents DOWN into
    * sliding context windows of `size` tokens every `stride` tokens
    * (overlap = size - stride; the RAG / long-doc training prep shape).
    * One native codegen token walk per row (`word_chunks`) + posexplode —
    * scan-side, no shuffle; emission stops at the first chunk that
    * reaches the document end, so no fully-contained tail fragments. */
  def chunkDocuments(docs: DataFrame, idCol: String, textCol: String,
                     size: Int, stride: Int): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    docs.select(col(idCol),
      posexplode(graft.functions.GraftFunctions.word_chunks(
        coalesce(col(textCol), lit("")), size, stride))
        .as(Seq("chunk_idx", "chunk")))
  }
}
