package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-source corpus DATA CARD — the one-row-per-source summary a
  * training-data team publishes with a release (datasheet/data-card
  * practice, Gebru et al. 2021): volume, duplication, language mix and
  * a short-doc fraction, all from ONE pass over the corpus.
  *
  * Scale posture: three partial-aggregating groupBys (per-source, the
  * per-(source, lang) mix, and the per-source distinct-content count via
  * a two-level hash groupBy — never a count(distinct) row expansion),
  * joined back on the tiny source key. Every shuffle carries the source
  * key + fixed-width counters; text contributes only its md5.
  */
object DataCard {

  /** One row per source:
    *  - n_docs / n_tokens / n_chars, mean_tokens (2dp)
    *  - dup_frac (4dp): 1 − distinct-md5(text) / n_docs — exact-dup mass
    *  - n_langs, top_lang (smallest lang among count ties — fully
    *    deterministic), top_lang_share (4dp)
    *  - short_frac (4dp): docs under `shortTokens` whitespace tokens. */
  def bySource(docs: DataFrame, srcCol: String, langCol: String,
               textCol: String, shortTokens: Int = 50): DataFrame = {
    val text = coalesce(col(textCol), lit(""))
    val base = docs.select(col(srcCol).as("source"),
      coalesce(col(langCol), lit("")).as("lang"),
      size(split(text, " ")).cast("long").as("tok"),
      length(text).cast("long").as("chr"),
      md5(text).as("h"))
    val vol = base.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(col("tok")).as("n_tokens"),
      sum(col("chr")).as("n_chars"),
      sum(when(col("tok") < shortTokens, 1L).otherwise(0L)).as("n_short"))
    // distinct content without expand: collapse (source, h) first — the
    // inner groupBy partial-aggregates map-side, so a boilerplate text
    // repeated 10⁹ times arrives as one row per partition, not 10⁹
    val uniq = base.groupBy("source", "h").agg(count(lit(1)).as("__n"))
      .groupBy("source").agg(count(lit(1)).as("n_unique"))
    val mix = base.groupBy("source", "lang").agg(count(lit(1)).as("n"))
    val wSrc = Window.partitionBy("source")
    val langs = mix.withColumn("maxn", max(col("n")).over(wSrc))
      .groupBy("source").agg(
        count(lit(1)).as("n_langs"),
        min(when(col("n") === col("maxn"), col("lang"))).as("top_lang"),
        max(col("n")).as("top_n"))
    vol.join(uniq, "source").join(langs, "source")
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_chars"),
        round(col("n_tokens") / col("n_docs"), 2).as("mean_tokens"),
        round(lit(1.0) - col("n_unique") / col("n_docs"), 4).as("dup_frac"),
        col("n_langs"),
        col("top_lang"),
        round(col("top_n") / col("n_docs"), 4).as("top_lang_share"),
        round(col("n_short") / col("n_docs"), 4).as("short_frac"))
      .orderBy("source")
  }
}
