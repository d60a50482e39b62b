package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Benchmark decontamination (SURVEY.md §2.2): remove training documents
  * that overlap an evaluation set by shared word n-grams — the standard
  * "n-gram collision" decontamination pass every serious pretraining
  * pipeline runs (Brown et al. 2020, "Language Models are Few-Shot
  * Learners", appendix C, used 13-gram collisions; the width is a knob
  * here).
  *
  * Scale design: the benchmark side is an EVAL set — thousands to a few
  * million rows against a 100 TB corpus — so its distinct n-gram set is
  * the natural broadcast side. The corpus side never shuffles text: the
  * native `word_shingles` Expression (already-distinct per-doc n-grams)
  * explodes scan-side, the broadcast semi-join keeps only colliding
  * (doc, n-gram) rows, and the one real shuffle is the per-doc collision
  * count over that filtered — tiny — set. The broadcast is size-gated
  * like Curation's loser set: an adversarially huge benchmark degrades to
  * a shuffle join instead of blowing the 8 GB broadcast limit.
  *
  * The reference has no decontamination surface; this is part of the
  * beyond-reference training-pipeline family.
  */
object Decontaminate {

  /** Above this many distinct benchmark n-grams, fall back to a shuffle
    * join (same rationale/threshold shape as Curation.MaxBroadcastLosers). */
  val MaxBroadcastNgrams = 10000000L

  /** Distinct benchmark n-grams (one column `sg`), size-gated broadcast. */
  private def benchNgrams(benchmark: DataFrame, textCol: String, w: Int,
                          maxBroadcast: Long): DataFrame = {
    val sg = benchmark
      .select(explode(GraftFunctions.word_shingles(col(textCol), w)).as("sg"))
      .distinct()
    // the count probe runs the (cheap: one text scan + distinct) subtree
    // once extra — the price of never handing an unbounded set to the
    // broadcast machinery
    if (sg.count() <= maxBroadcast) broadcast(sg) else sg
  }

  /** Contamination report: corpus docs sharing ≥ `minShared` distinct
    * w-grams with the benchmark set → (doc_id, n_shared). */
  def report(corpus: DataFrame, benchmark: DataFrame, idCol: String,
             textCol: String, w: Int = 5, minShared: Int = 1,
             maxBroadcast: Long = MaxBroadcastNgrams): DataFrame = {
    require(w > 0 && minShared > 0,
      s"w/minShared must be positive, got ($w, $minShared)")
    GraftFunctions.ensureRegistered(corpus.sparkSession)
    val corpusSg = corpus.select(col(idCol).as("doc_id"),
      explode(GraftFunctions.word_shingles(col(textCol), w)).as("sg"))
    corpusSg
      .join(benchNgrams(benchmark, textCol, w, maxBroadcast), "sg")
      // word_shingles emits per-doc DISTINCT n-grams, so a plain count is
      // already the distinct-collision count
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Decontaminated corpus: drop every doc flagged by [[report]]. The
    * anti-join's right side is per-doc ids (≤ corpus row count, usually
    * far smaller) — left to AQE to broadcast when it fits. */
  def clean(corpus: DataFrame, benchmark: DataFrame, idCol: String,
            textCol: String, w: Int = 5, minShared: Int = 1,
            maxBroadcast: Long = MaxBroadcastNgrams): DataFrame =
    corpus.join(
      report(corpus, benchmark, idCol, textCol, w, minShared, maxBroadcast)
        .select(col("doc_id").as("__contaminated_id")),
      col(idCol) === col("__contaminated_id"), "left_anti")
}
