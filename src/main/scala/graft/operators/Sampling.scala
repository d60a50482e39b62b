package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines (SURVEY.md §2.2).
  *
  * Spark's own `sample`/`sampleBy` are seeded per-partition and change
  * results under repartitioning — useless for reproducible corpus cuts. A
  * 100 TB pipeline wants CONTENT-keyed sampling: membership is a pure
  * function of (seed, row id), so the same cut falls out on any cluster
  * layout, survives re-runs, and composes with incremental ingestion (new
  * rows join the sample iff their key hashes under the threshold —
  * nothing resamples).
  *
  * Mechanics: key = md5(seed || "|" || id); a row is kept iff the first 4
  * hex chars compare below a threshold derived from the fraction
  * (granularity 1/65536 — exact for the power-of-two fractions pipelines
  * actually use). Pure scan-side projection + filter: no shuffle, no
  * state, pushes through whole-stage codegen, and the oracle reproduces
  * it verbatim (DuckDB md5 emits the same lowercase hex).
  *
  * The reference has no sampling surface (it pages full tables,
  * base.py:1472); this is part of the beyond-reference pipeline family.
  */
object Sampling {

  /** Deterministic per-row hash key in [0, 1) represented as 4 hex chars
    * of md5(seed|id) — uniform, engine-portable (lowercase hex on Spark
    * and DuckDB), and stable under any partitioning. */
  def hashKey(seed: String, id: Column): Column =
    substring(md5(concat(lit(seed + "|"), id.cast("string"))), 1, 4)

  /** 4-hex-char threshold encoding floor(frac · 2¹⁶); fractions ≥ 1 have
    * no 4-char upper bound and are handled as keep-all. */
  private def thresholdHex(frac: Double): String = {
    require(frac >= 0, s"fraction must be >= 0, got $frac")
    f"${math.min((frac * 65536).toLong, 65535L)}%04x"
  }

  private def keepCond(seed: String, id: Column, frac: Double): Column =
    if (frac >= 1.0) lit(true)
    else if (frac <= 0.0) lit(false)
    else hashKey(seed, id) < lit(thresholdHex(frac))

  /** Deterministic Bernoulli(frac) sample keyed on (seed, idCol). */
  def bernoulli(df: DataFrame, idCol: String, frac: Double,
                seed: String = "s42"): DataFrame =
    df.filter(keepCond(seed, col(idCol), frac))

  /** Stratified deterministic sample: per-stratum fractions (strata
    * missing from the map use `defaultFrac`). Same scan-side shape as
    * [[bernoulli]] — the stratum column only selects which threshold the
    * row's hash key is compared against, so skewed strata cost nothing. */
  def stratified(df: DataFrame, idCol: String, stratumCol: String,
                 fractions: Map[String, Double], defaultFrac: Double = 0.0,
                 seed: String = "s42"): DataFrame = {
    val cond = fractions.toSeq.sortBy(_._1).foldRight(
      keepCond(seed, col(idCol), defaultFrac)) { case ((stratum, f), rest) =>
      when(col(stratumCol) === lit(stratum), keepCond(seed, col(idCol), f))
        .otherwise(rest)
    }
    df.filter(cond)
  }

  /** Deterministic epoch shuffle: the global random order a training run
    * reads the corpus in, produced without an RNG so any cluster layout
    * and any re-run deals the SAME order. Each row gets a shard
    * (`shards`-way split by its hash key's leading bits) and a position
    * within the shard (rank by full hash key). Reading shards in index
    * order, each ordered by `pos`, is one global md5-keyed permutation —
    * exactly how shuffled training shards are laid out on object storage.
    * A different `seed` deals a fresh permutation per epoch.
    *
    * Scale posture: the shard assignment is scan-side, and the rank
    * window sorts a NARROW (id, key, shard) projection only — the row
    * payload (text, embeddings: the wide bytes at 100 TB) never enters
    * the window sort; it rejoins by `idCol` afterwards in an ordinary
    * equi-join that hash-partitions instead of sorting. `shards` is any
    * power of two up to 2³² (shard = leading key bits split evenly, which
    * keeps the DuckDB oracle a pure string-arithmetic twin) — pick it so
    * a shard's (id, key) rows fit a task's sort buffer (10⁵–10⁶ rows even
    * at 100 TB once the payload stays out). `idCol` must be unique (it is
    * the rejoin key). */
  def epochShuffle(df: DataFrame, idCol: String, seed: String = "s42",
                   shards: Int = 16): DataFrame = {
    require(shards > 0 && java.lang.Long.bitCount(shards.toLong) == 1 &&
        shards.toLong <= (1L << 32),
      s"shards must be a power of two <= 2^32, got $shards")
    val key = md5(concat(lit(seed + "|"), col(idCol).cast("string")))
    // leading 32 key bits give every power-of-two shard count the same
    // leading-bit split the old 16-bit formula produced for shards <= 65536
    val shard = (conv(substring(key, 1, 8), 16, 10).cast("long") /
      lit((1L << 32) / shards)).cast("long")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__key"), col(idCol))
    val ranked = df.select(col(idCol), key.as("__key"))
      .withColumn("shard", shard)
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__key")
    df.join(ranked, Seq(idCol))
  }

  /** Deterministic train/val/test assignment: every row gets a split
    * label from disjoint hash-key ranges — a pure function of (seed, id),
    * so the split survives re-runs, repartitioning, and incremental
    * ingestion (new rows land in a split without disturbing old ones),
    * and the three cuts are disjoint BY CONSTRUCTION (one key compared
    * to cumulative thresholds, not three independent samples). The last
    * split is the catch-all, so thresholds' 1/2¹⁶ granularity can never
    * drop a row. */
  def split(df: DataFrame, idCol: String,
            splits: Seq[(String, Double)], seed: String = "s42"): DataFrame = {
    require(splits.size >= 2, "need at least two splits")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    val cum = splits.init.scanLeft(0.0)(_ + _._2).tail
    val key = hashKey(seed, col(idCol))
    val label = splits.init.zip(cum).foldRight(lit(splits.last._1)) {
      case (((name, _), c), rest) =>
        when(key < lit(thresholdHex(c)), lit(name)).otherwise(rest)
    }
    df.withColumn("split", label)
  }

  /** Temperature-scaled mixture sampling (τ = 0.5): downsample every
    * stratum toward the LARGEST one with rate √(nᵢ/n_max) — the standard
    * multilingual-corpus rebalancing shape (mT5/XLM-R sample languages at
    * p^α to keep head languages from drowning the tail; anchoring the
    * rate to the largest stratum instead of a normalized sum keeps the
    * arithmetic a single division + square root, both IEEE-754
    * correctly-rounded operations, so DuckDB reproduces the threshold
    * BIT-FOR-BIT — a normalizing sum would round differently depending
    * on accumulation order).
    *
    * Shape: one partial-aggregated count per stratum, a 1-row global max,
    * rates broadcast back onto the scan, then the same md5-threshold
    * filter as [[bernoulli]] — membership stays a pure function of
    * (seed, id), so re-runs and cluster layouts agree. The ×65536
    * threshold scaling is exact (power of two ⇒ exponent shift), and the
    * largest stratum short-circuits to keep-all rather than losing
    * 1/65536 of its rows to threshold clipping.
    *
    * Rows with a NULL stratum are DROPPED (the equi-join back to the
    * rates, like SQL's USING, doesn't match null keys) — coalesce the
    * stratum to a sentinel first if null must be its own stratum. */
  def temperature(df: DataFrame, idCol: String, stratumCol: String,
                  seed: String = "s42"): DataFrame =
    applyTemperature(df, temperatureRates(df, stratumCol), stratumCol,
      idCol, seed)

  /** The bounded per-stratum rate relation of [[temperature]]:
    * (stratum, __n, __nmax, __thr) with __thr = floor(√(nᵢ/n_max)·65536).
    * Exposed so the streaming twin can score a live stream against a
    * STATIC snapshot's rates (the trained-statistics convention, like
    * anomalyStream) while sharing this exact arithmetic.
    * __thr is a LONG, not pre-formatted hex: n/nmax can round UP to
    * exactly 1.0 when strata exceed 2^53 rows, and a 65536 threshold
    * formatted to 5 hex chars would mis-compare against 4-char keys —
    * the >= 65536 branch in [[applyTemperature]] keeps that regime in
    * keep-all territory. */
  def temperatureRates(df: DataFrame, stratumCol: String): DataFrame = {
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__n"))
    val nmax = counts.agg(max(col("__n")).as("__nmax"))
    counts.crossJoin(broadcast(nmax))
      .withColumn("__thr",
        floor(sqrt(col("__n").cast("double") / col("__nmax").cast("double"))
          * 65536).cast("long"))
  }

  /** Membership filter shared by the batch op and the streaming twin:
    * rates broadcast onto the scan, keep iff the largest stratum
    * (keep-all fast path) or the row's md5 hash key compares under the
    * stratum threshold — a pure function of (seed, id), so batch and
    * stream admit exactly the same rows. Rows whose stratum is absent
    * from `rates` are DROPPED (equi-join semantics). */
  def applyTemperature(df: DataFrame, rates: DataFrame, stratumCol: String,
                       idCol: String, seed: String = "s42"): DataFrame =
    df.join(broadcast(rates), stratumCol)
      .filter(col("__n") === col("__nmax") || col("__thr") >= 65536L ||
        hashKey(seed, col(idCol)) < format_string("%04x", col("__thr")))
      .drop("__n", "__nmax", "__thr")

  /** Exactly min(n, |stratum|) rows per stratum, chosen by hash-key order
    * (deterministic "random" without an RNG). This is the exact-n ANCHOR
    * of the sampling pair: the row_number window sorts each stratum inside
    * one task, so a 100 TB stratum serializes — use [[stratified]] with
    * frac ≈ n/|stratum| at scale and this path when strata are bounded
    * (e.g. per-source quotas over thousands of sources). */
  def exactPerStratum(df: DataFrame, idCol: String, stratumCol: String,
                      n: Int, seed: String = "s42"): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(hashKey(seed, col(idCol)), col(idCol))
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= n)
  }

  /** TOKEN-budget mixture realization, exact ANCHOR: per source, take
    * docs in deterministic hash-key order until the next doc would push
    * the source's running token total past `budget` — the step that
    * turns mixture weights into an actual training corpus ("give me N
    * tokens of each source, reproducibly"). Docs are kept whole (the
    * boundary-crossing doc is dropped, not truncated — packing owns
    * sub-doc layout).
    *
    * The per-source cumulative sum is a window over a NARROW
    * (id, source, n_tok, key) projection (the epochShuffle discipline —
    * text never enters the sort). Like [[exactPerStratum]] this anchors
    * the pair: a 100 TB source serializes its window in one task, so at
    * scale use [[takeTokenBudgetRate]] — the scan-side thinning twin
    * whose expected kept-token mass is the same budget. */
  def takeTokenBudget(docs: DataFrame, idCol: String, textCol: String,
                      srcCol: String, budget: Long,
                      seed: String = "s42"): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val narrow = docs.select(col(idCol).as("doc_id"),
      col(srcCol).as("source"),
      size(org.apache.spark.sql.functions.split(
        coalesce(col(textCol), lit("")), " ")).cast("long").as("n_tok"),
      hashKey(seed, col(idCol)).as("__key"))
    val w = Window.partitionBy("source").orderBy(col("__key"), col("doc_id"))
    narrow.withColumn("cum_tok", sum(col("n_tok")).over(w))
      .filter(col("cum_tok") <= budget)
      .select("doc_id", "source", "n_tok", "cum_tok")
      .orderBy("source", "cum_tok", "doc_id")
  }

  /** TOKEN-budget mixture realization, scale TWIN: thin each source at
    * rate budget/total_tokens with the content-keyed threshold, so the
    * EXPECTED kept token mass per source is the budget while the whole
    * op stays one bounded per-source aggregate plus a scan-side filter
    * (no window, no per-source serialization). The threshold is derived
    * in integer arithmetic — floor(budget·2¹⁶ / total) — so both
    * engines agree bit-for-bit; sources already under budget keep
    * everything. */
  def takeTokenBudgetRate(docs: DataFrame, idCol: String, textCol: String,
                          srcCol: String, budget: Long,
                          seed: String = "s42"): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    // threshold math is budget * 2^16 in a signed long (advisor r12:
    // beyond this the multiply wraps and yields a silent wrong threshold)
    require(budget <= Long.MaxValue / 65536L,
      s"budget too large for the 2^16 fixed-point threshold: $budget")
    val tok = size(org.apache.spark.sql.functions.split(
      coalesce(col(textCol), lit("")), " ")).cast("long")
    // bounded driver collect: one row per source (the mixture's stratum
    // count, thousands at most), same posture as the stratified rate map
    val totals = docs.groupBy(col(srcCol).as("source"))
      .agg(sum(tok).as("tot"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val keep = totals.sortBy(_._1).foldRight(lit(false)) {
      case ((src, tot), rest) =>
        val thr16 = math.min(65536L, budget * 65536L / tot)
        val cond =
          if (thr16 >= 65536L) lit(true)
          else hashKey(seed, col(idCol)) < lit(f"$thr16%04x")
        when(col(srcCol) === lit(src), cond).otherwise(rest)
    }
    docs.filter(keep)
      .select(col(idCol).as("doc_id"), col(srcCol).as("source"),
        tok.as("n_tok"))
      .orderBy("source", "doc_id")
  }
}
