package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-family tokenizer comparison — the report a training-data team
  * reads to CHOOSE a tokenizer: occurrence-weighted fertility
  * (tokens/word) and compression (chars/token) for the three trained
  * families (char-BPE, WordPiece, unigram-LM) over the same corpus.
  *
  * Each family is scored over ITS OWN word universe (that asymmetry is
  * the comparison's point): BPE and WordPiece tokenize the ASCII
  * `[^A-Za-z]+`-split lowercase words (1-char words = one token — the
  * encode surface covers what merge training drops), unigram the
  * whitespace-split words. All totals are exact-integer sums over the
  * Heaps-bounded distinct-word tables (occurrence-weighted), collected
  * EAGERLY one bounded row per family — the two ratios are single IEEE
  * divisions of exact longs, replayed identically by the oracle (the
  * three training replays nest as independent `WITH` scopes inside
  * MATERIALIZED CTEs).
  *
  * Output: (family, total_words, total_chars, total_tokens, fertility,
  * chars_per_token), family order. */
object TokenizerReport {

  private case class FamRow(family: String, total_words: Long,
                            total_chars: Long, total_tokens: Long,
                            fertility: Double, chars_per_token: Double)

  /** Occurrence-weighted (Σc, Σc·chars, Σc·tokens) of a
    * (c, chars, np) relation — one bounded row. */
  private def stats(df: DataFrame): (Long, Long, Long) = {
    val r = df.agg(
      sum(col("c")).cast("long").as("tw"),
      sum(col("c") * col("chars")).cast("long").as("tc"),
      sum(col("c") * col("np")).cast("long").as("tt")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  private def fam(name: String, t: (Long, Long, Long)): FamRow = {
    val (tw, tc, tt) = t
    FamRow(name, tw, tc, tt,
      tt.toDouble / tw.toDouble, tc.toDouble / tt.toDouble)
  }

  def report(docs: DataFrame, textCol: String = "text",
             bpeMerges: Int = 4, wpMerges: Int = 6,
             wpMaxPieceLen: Int = 8): DataFrame = {
    val spark: SparkSession = docs.sparkSession
    import spark.implicits._

    // char-BPE: the trained vocabulary's final reprs carry the token
    // count per >=2-char word; 1-char words are single tokens
    val (_, vocab, cleanup) = Bpe.trainWithVocabManaged(docs, textCol, bpeMerges)
    val multi = vocab.select(col("c"), length(col("w")).as("chars"),
      size(split(col("repr"), " ")).cast("long").as("np"))
    val ones = docs
      .select(explode(split(coalesce(col(textCol), lit("")),
        "[^A-Za-z]+")).as("w0"))
      .filter(length(col("w0")) === 1)
      .select(lower(col("w0")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .select(col("c"), lit(1L).as("chars"), lit(1L).as("np"))
    val bpeStats = stats(multi.unionByName(ones))
    cleanup()

    val wpStats = stats(
      Wordpiece.segmentWords(docs, textCol, wpMerges, wpMaxPieceLen)
        .select(col("wcount").as("c"), length(col("word")).as("chars"),
          col("n_pieces").as("np")))

    val ugStats = stats(
      Unigram.segmentWords(docs, textCol)
        .select(col("wcount").as("c"), length(col("word")).as("chars"),
          col("n_pieces").as("np")))

    Seq(fam("bpe", bpeStats), fam("unigram", ugStats),
        fam("wordpiece", wpStats))
      .toDF().orderBy("family")
  }
}
