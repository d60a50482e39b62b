package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-data EXPORT: deterministic sharding plus a verifiable
  * per-shard manifest — the sink side of the curation pipeline
  * (WebDataset/Megatron-style shard layouts publish exactly this shape:
  * shard file + row count + token count + content checksum, so a
  * training job can verify what it reads against what curation wrote).
  *
  * Scale posture: shard assignment is a pure scan-side projection (the
  * epochShuffle md5 leading-bit rule — layout/rerun-invariant, no RNG),
  * and the manifest is ONE partial-aggregating groupBy on the shard id;
  * the content checksum is an order-independent XOR fold so it needs no
  * sort and combines map-side. Nothing here is wider than
  * (shard, fixed-width counters).
  */
object Export {

  /** Deterministic shard id from the epochShuffle key rule: leading 32
    * bits of md5(seed|id) split into `shards` equal leading-bit ranges.
    * Same key ⇒ the shard layout and any epochShuffle read order with
    * the same seed agree on where a doc lands. */
  def shardCol(idCol: String, seed: String, shards: Int) = {
    require(shards > 0 && java.lang.Long.bitCount(shards.toLong) == 1 &&
        shards.toLong <= (1L << 32),
      s"shards must be a power of two <= 2^32, got $shards")
    (conv(substring(md5(concat(lit(seed + "|"), col(idCol).cast("string"))),
      1, 8), 16, 10).cast("long") / lit((1L << 32) / shards)).cast("long")
  }

  /** Per-shard export manifest over (id, text) docs:
    *  - n_docs, n_tokens (whitespace tokens), n_chars
    *  - checksum: XOR of per-doc 60-bit values folded from
    *    md5(id|text) — ORDER-INDEPENDENT (no sort, map-side combinable)
    *    and id-salted, so two identical texts under different ids cannot
    *    cancel each other out of the fold
    *  - min_doc/max_doc: the shard's id range, the cheap first-line
    *    diff when a checksum mismatches.
    * One shuffle: the shard groupBy (partial aggs combine map-side). */
  def shardManifest(docs: DataFrame, idCol: String, textCol: String,
                    seed: String = "s42", shards: Int = 16): DataFrame =
    manifest(docs, idCol, textCol, seed, shards).orderBy("shard")

  /** The manifest aggregation without the presentation sort — every
    * aggregate here (count / sum / XOR / min / max) is MERGEABLE, so the
    * identical plan runs as a Structured Streaming stateful aggregation
    * (each micro-batch folds into per-shard state, nothing reprocesses;
    * see EventStreams.manifestStream). */
  def manifest(docs: DataFrame, idCol: String, textCol: String,
               seed: String = "s42", shards: Int = 16): DataFrame = {
    val text = coalesce(col(textCol), lit(""))
    docs.select(col(idCol).as("doc_id"),
        shardCol(idCol, seed, shards).as("shard"),
        size(split(text, " ")).cast("long").as("__tok"),
        length(text).cast("long").as("__chr"),
        conv(substring(md5(concat(col(idCol).cast("string"), lit("|"), text)),
          1, 15), 16, 10).cast("long").as("__h"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__tok")).as("n_tokens"),
        sum(col("__chr")).as("n_chars"),
        expr("bit_xor(__h)").as("checksum"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
  }

  /** Write the docs as a Hive-partitioned shard layout
    * (`dir/shard=K/...`). Range-repartitioned on the shard id so each
    * output partition holds one shard's rows (contiguous files per
    * shard directory, no shard straddling a task by hash collision).
    * Verify a round trip by re-reading the layout and recomputing
    * [[shardManifest]] — the spec does exactly that. */
  def writeShards(docs: DataFrame, dir: String, idCol: String,
                  textCol: String, seed: String = "s42",
                  shards: Int = 16): Unit =
    docs.withColumn("shard", shardCol(idCol, seed, shards))
      .repartitionByRange(shards, col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(dir)
}
