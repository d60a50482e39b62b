package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Span-corruption data prep for denoising objectives (T5, Raffel et
  * al. 2020 §3.1.4; UL2's R-denoiser): replace token spans with ordered
  * sentinel tokens in the INPUT and emit the removed spans, each
  * prefixed by its sentinel, as the TARGET — the (input, target) pair a
  * seq2seq pretraining run consumes.
  *
  * Deterministic by construction (the corpus-cut discipline of
  * [[Sampling]]): a span STARTS at token position p iff the 16-bit fold
  * of md5(seed|id|p) compares under `thr16`, spans are `w` tokens,
  * overlapping/adjacent spans MERGE into one sentinel (T5's "consecutive
  * spans" rule) — so the same (seed, thr16, w) deals the same corruption
  * on any cluster layout, any re-run, both engines. Expected corruption
  * rate ≤ w·thr16/2¹⁶ (merging only lowers it).
  *
  * Shape: one posexplode of the token stream; span starts are flagged
  * SCAN-SIDE (a pure hash compare — no candidate join at all, unlike the
  * dedup cut); covered indexes, maximal runs and run ordinals come from
  * per-doc windows over (id, j) ints; input and target reassemble
  * positionally. Nothing shuffles wider than (id, int, token).
  */
object Denoise {

  /** (doc_id, n_tokens, n_corrupt, n_spans, input_s, target_s) per doc.
    * Sentinels are `<extra_id_K>`, K = 0-based run ordinal in token
    * order — input sentinels and target prefixes agree by construction.
    * Uncorrupted docs pass through (empty target), docs shorter than
    * `w` are never corrupted. */
  def spanCorrupt(docs: DataFrame, idCol: String, textCol: String,
                  w: Int = 3, thr16: Long = 4096L,
                  seed: String = "s42"): DataFrame = {
    require(w > 0 && thr16 > 0 && thr16 < 65536L,
      s"need w > 0 and 0 < thr16 < 65536, got ($w, $thr16)")
    val base = docs.select(col(idCol).as("doc_id"),
      coalesce(col(textCol), lit("")).as("text"))
    val toks = base.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("j", "tok")))
      .withColumn("len", count(lit(1)).over(Window.partitionBy("doc_id")))
    // span starts: hash-flagged scan-side; a start needs w whole tokens
    val flagged = toks
      .filter(col("j") <= col("len") - w)
      .filter(conv(substring(md5(concat(lit(seed + "|"),
          col("doc_id").cast("string"), lit("|"), col("j").cast("string"))),
        1, 4), 16, 10).cast("long") < thr16)
      .select(col("doc_id"), col("j").as("pos"))
    val covered = flagged
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(w - 1))).as("j"))
      .distinct()
    val byDoc = Window.partitionBy("doc_id").orderBy("j")
    // run ordinal: 0-based count of run boundaries up to and incl. j
    val runs = covered
      .withColumn("prev", lag(col("j"), 1).over(byDoc))
      .withColumn("start",
        when(col("prev").isNull || col("j") - col("prev") > 1, 1L)
          .otherwise(0L))
      .withColumn("run", sum(col("start")).over(byDoc) - 1L)
    val sentinel = concat(lit("<extra_id_"), col("run").cast("string"),
      lit(">"))
    // input: kept tokens + one sentinel at each run's first covered j
    val inputTokens = toks.join(covered, Seq("doc_id", "j"), "left_anti")
      .select(col("doc_id"), col("j"), col("tok"))
      .unionByName(runs.filter(col("start") === 1L)
        .select(col("doc_id"), col("j"), sentinel.as("tok")))
    val inputs = inputTokens.groupBy("doc_id")
      .agg(array_join(array_sort(collect_list(struct(col("j"), col("tok"))))
        .getField("tok"), " ").as("input_s"))
    // target: per covered token in order, sentinel-prefixed at run starts
    val targetTokens = runs.join(
        toks.select(col("doc_id"), col("j"), col("tok")), Seq("doc_id", "j"))
      .select(col("doc_id"), col("j"),
        when(col("start") === 1L, concat(sentinel, lit(" "), col("tok")))
          .otherwise(col("tok")).as("tok"))
    val targets = targetTokens.groupBy("doc_id")
      .agg(count(lit(1)).as("n_corrupt"),
        array_join(array_sort(collect_list(struct(col("j"), col("tok"))))
          .getField("tok"), " ").as("target_s"))
    val spanCounts = runs.groupBy("doc_id")
      .agg(sum(col("start")).as("n_spans"))
    base.select(col("doc_id"), col("text"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .join(inputs, Seq("doc_id"), "left_outer")
      .join(targets, Seq("doc_id"), "left_outer")
      .join(spanCounts, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_corrupt"), lit(0L)).as("n_corrupt"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("input_s"), col("text")).as("input_s"),
        coalesce(col("target_s"), lit("")).as("target_s"))
      .orderBy("doc_id")
  }

  /** Fill-in-the-middle transform (Bavarian et al. 2022, "Efficient
    * Training of Language Models to Fill in the Middle"): restructure a
    * hash-chosen fraction of documents into PSM order —
    * `<PRE> prefix <SUF> suffix <MID> middle` — so an autoregressive
    * model learns infilling; the rest pass through verbatim (`plain`),
    * mirroring the paper's fim-rate hyperparameter.
    *
    * Fully deterministic, fully scan-side: the apply decision is the
    * 16-bit md5 threshold (rate = thr16/2¹⁶) and the two token cut
    * points are independent 32-bit folds of md5(seed|id|p{1,2}) reduced
    * mod (len+1) — a pure projection, ZERO shuffle (the one ordering is
    * the presentation sort). Sentinels join as their own tokens via
    * array concat, so empty prefix/middle/suffix segments never leave
    * stray separators. Docs under `minTokens` stay plain. */
  def fimTransform(docs: DataFrame, idCol: String, textCol: String,
                   thr16: Long = 32768L, minTokens: Int = 4,
                   seed: String = "s42"): DataFrame = {
    require(thr16 > 0 && thr16 <= 65536L && minTokens >= 2,
      s"need 0 < thr16 <= 65536 and minTokens >= 2, got ($thr16, $minTokens)")
    def fold(tag: String, hexLen: Int) =
      conv(substring(md5(concat(lit(seed + "|"),
        col("doc_id").cast("string"), lit("|" + tag))), 1, hexLen), 16, 10)
        .cast("long")
    val base = docs.select(col(idCol).as("doc_id"),
        coalesce(col(textCol), lit("")).as("text"))
      .withColumn("t", split(col("text"), " "))
      .withColumn("len", size(col("t")).cast("long"))
    val withCuts = base
      .withColumn("apply",
        col("len") >= minTokens && fold("fim", 4) < thr16)
      .withColumn("k1", fold("p1", 8) % (col("len") + 1L))
      .withColumn("k2", fold("p2", 8) % (col("len") + 1L))
      .withColumn("p1", when(col("apply"), least(col("k1"), col("k2")))
        .otherwise(lit(null)))
      .withColumn("p2", when(col("apply"), greatest(col("k1"), col("k2")))
        .otherwise(lit(null)))
    withCuts.select(col("doc_id"), col("len").as("n_tokens"),
        when(col("apply"), lit("psm")).otherwise(lit("plain")).as("mode"),
        col("p1"), col("p2"),
        when(col("apply"), array_join(concat(
            array(lit("<PRE>")),
            expr("slice(t, 1, cast(p1 as int))"),
            array(lit("<SUF>")),
            expr("slice(t, cast(p2 as int) + 1, cast(len - p2 as int))"),
            array(lit("<MID>")),
            expr("slice(t, cast(p1 as int) + 1, cast(p2 - p1 as int))")),
          " "))
          .otherwise(col("text")).as("fim_s"))
      .orderBy("doc_id")
  }
}
