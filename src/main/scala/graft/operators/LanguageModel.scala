package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Corpus-trained unigram language-model perplexity scoring — the CCNet
  * quality-filter shape (Wenzek et al. 2020, "CCNet: Extracting High
  * Quality Monolingual Datasets from Web Crawl Data", §4.3 filters web
  * documents by LM perplexity; their model is a KenLM 5-gram — the knob
  * here is a unigram model trained on the corpus itself, which keeps the
  * estimator closed-form while exercising the identical pipeline shape:
  * train token statistics, broadcast the model, score every document
  * scan-side, filter on the score).
  *
  * Model: p(tok) = count(tok) / N for tokens with count ≥ `minCount`
  * (the vocabulary); out-of-vocabulary tokens get the smoothing mass
  * `oovAlpha / N`. Per document: avg_nll = mean(-ln p) over its token
  * stream and ppl = exp(avg_nll).
  *
  * Scale posture: training is ONE partial-aggregated count over the
  * token stream (map-side combine collapses each task's Zipf head before
  * the shuffle); the vocabulary (count ≥ minCount — Zipf-bounded, NOT
  * corpus-bounded) is size-gated broadcast, so scoring is a scan-side
  * broadcast left-join + per-doc partial aggregation: document text
  * never shuffles, only (doc_id, decimal-sum, count) partials do. The
  * per-token nll is summed as DECIMAL(28,6) (the repo-wide exact-sum
  * discipline) so the result is bit-stable under any partitioning.
  *
  * The reference has no LM surface; this is part of the beyond-reference
  * training-pipeline family.
  */
object LanguageModel {

  /** Above this many vocabulary rows, the model falls back to a shuffle
    * join (same gate shape as Decontaminate.MaxBroadcastNgrams). */
  val MaxBroadcastVocab = 10000000L

  private val Dec = org.apache.spark.sql.types.DataTypes.createDecimalType(28, 6)

  /** Per-document unigram-LM score: (idCol, n_tokens, avg_nll, ppl),
    * doubles rounded (4dp / 2dp) for engine parity. One-shot convenience
    * over [[perplexityManaged]]. */
  def perplexity(docs: DataFrame, idCol: String, textCol: String,
                 minCount: Long = 2, oovAlpha: Double = 0.5,
                 maxBroadcast: Long = MaxBroadcastVocab): DataFrame =
    perplexityManaged(docs, idCol, textCol, minCount, oovAlpha,
      maxBroadcast)._1

  /** [[perplexity]] plus the cache-lifecycle handle: (plan, cleanup).
    * Invoke cleanup after materializing the plan. */
  def perplexityManaged(docs: DataFrame, idCol: String, textCol: String,
                        minCount: Long = 2, oovAlpha: Double = 0.5,
                        maxBroadcast: Long = MaxBroadcastVocab)
      : (DataFrame, () => Unit) = {
    require(minCount >= 1 && oovAlpha > 0,
      s"minCount must be >= 1 and oovAlpha > 0, got ($minCount, $oovAlpha)")
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(split(coalesce(col(textCol), lit("")), " ")).as("tok"))
    // train: one partial-aggregated count; persisted because both the
    // total-mass probe and the vocabulary read it
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("c"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // two bounded driver actions (the benchNgramsManaged pattern): the
    // model's total mass N, and the vocab row count for the size gate
    val n = counts.agg(sum(col("c"))).head().getLong(0).toDouble
    val vocab = counts.filter(col("c") >= minCount)
    val gated =
      if (vocab.count() <= maxBroadcast) broadcast(vocab) else vocab
    val nll = -log(coalesce(col("c").cast("double"), lit(oovAlpha)) / lit(n))
    val out = toks.join(gated, Seq("tok"), "left")
      .select(col("doc_id"), nll.as("nll"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        (sum(col("nll").cast(Dec)).cast("double") / count(lit(1))).as("raw"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("raw"), 4).as("avg_nll"),
        round(exp(col("raw")), 2).as("ppl"))
    (out, () => { counts.unpersist(blocking = true); () })
  }
}
