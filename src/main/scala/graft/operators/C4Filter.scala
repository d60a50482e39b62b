package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style line-level corpus cleaning (Raffel et al. 2020, "Exploring the
  * Limits of Transfer Learning with a Unified Text-to-Text Transformer",
  * §2.2): keep only lines that end in a terminal punctuation mark and have
  * at least `minWords` words, drop lines carrying boilerplate policy terms
  * ("javascript", "lorem ipsum", "cookie"), drop the WHOLE document when it
  * contains a curly brace (code leakage) or retains fewer than
  * `minKeptLines` lines. This is the line-granular complement to the
  * document-level Gopher gates (TextAnalysis.gopherRules): Gopher decides
  * keep/drop per doc, C4 rewrites the doc from its surviving lines.
  *
  * Scale shape: one scan-side projection per doc — split, per-line lambda
  * filter, re-join. No shuffle, no explode (the line array never leaves the
  * row), pipelines with the parquet scan; the per-source report is a single
  * partial-agg groupBy. At 100 TB this is embarrassingly parallel.
  */
object C4Filter {

  /** Terminal punctuation accepted by the keep rule (C4 uses . ! ? ").
    * Kept as data so the oracle replays the same membership test. */
  val TerminalPunct: Seq[String] = Seq(".", "!", "?", "\"")

  /** Lowercase policy terms whose presence drops a LINE (C4 §2.2 drops
    * lines mentioning javascript and docs with "lorem ipsum"; we apply
    * both, plus the cookie-notice boilerplate, at line granularity). */
  val PolicyTerms: Seq[String] = Seq("javascript", "lorem ipsum", "cookie")

  /** Deterministic line decoration for the punctuation-free synthetic
    * corpus: chunk the word stream into 8-word lines, then per line with
    * mark = (doc_id*31 + line_idx) mod 5 plant
    *   0 -> the bare chunk            (no terminal punct -> filtered)
    *   1 -> a "lorem ipsum" line      (policy-filtered)
    *   2 -> a javascript/cookie line  (policy-filtered)
    *   3,4 -> chunk || "."            (kept iff >= minWords words)
    * and docs with doc_id mod 13 == 7 get a trailing "(function() {" line
    * (the C4 curly-brace doc-drop rule). The decoration is replayed
    * verbatim by the DuckDB oracle, so the filter itself is what's tested.
    */
  def withSyntheticLines(docs: DataFrame, idCol: String, textCol: String,
                         lineWords: Int = 8): DataFrame = {
    val tk = split(coalesce(col(textCol), lit("")), " ")
    val chunks = transform(
      sequence(lit(1), greatest(size(tk), lit(1)), lit(lineWords)),
      i => array_join(slice(tk, i, lit(lineWords)), " "))
    val decorated = transform(chunks, (x, j) => {
      val mark = pmod(col(idCol) * 31 + j, lit(5))
      when(mark === 0, x)
        .when(mark === 1, lit("lorem ipsum dolor sit amet."))
        .when(mark === 2, lit("please enable javascript and accept our cookie policy."))
        .otherwise(concat(x, lit(".")))
    })
    val withBrace = when(pmod(col(idCol), lit(13)) === 7,
      concat(decorated, array(lit("(function() {")))).otherwise(decorated)
    docs.withColumn(textCol, array_join(withBrace, "\n"))
  }

  /** The surviving lines of a '\n'-joined text under the keep rule —
    * composable into batch and streaming projections alike. */
  def keptLinesCol(text: Column, minWords: Int = 5): Column =
    filter(split(text, "\n"), l => lineKept(l, minWords))

  /** True iff any line carries a curly brace — either '{' or '}', per
    * the C4 rule (Raffel et al. 2020 §2.2: drop pages containing "the
    * curly bracket", i.e. any brace — code markers) (advisor r12: a
    * '}'-only doc must drop too). */
  def braceCol(text: Column): Column =
    exists(split(text, "\n"), l => l.contains("{") || l.contains("}"))

  /** True iff the line survives C4's keep rule. */
  private def lineKept(l: Column, minWords: Int): Column = {
    val punct = TerminalPunct.foldLeft(lit(false)) { (acc, p) =>
      acc || substring(l, -1, 1) === p
    }
    val policy = PolicyTerms.foldLeft(lit(false)) { (acc, t) =>
      acc || lower(l).contains(t)
    }
    punct && size(split(l, " ")) >= minWords && !policy
  }

  /** Per-document line filter: returns only the documents that survive
    * (no brace anywhere, >= minKeptLines kept lines), with the rebuilt
    * text and line counts. */
  def filterDocs(docs: DataFrame, idCol: String, textCol: String,
                 minWords: Int = 5, minKeptLines: Int = 3): DataFrame = {
    docs
      .withColumn("lines", split(col(textCol), "\n"))
      .withColumn("kept_lines", keptLinesCol(col(textCol), minWords))
      .where(!braceCol(col(textCol)) &&
        size(col("kept_lines")) >= minKeptLines)
      .select(col(idCol),
        size(col("lines")).as("n_lines"),
        size(col("kept_lines")).as("n_kept"),
        array_join(col("kept_lines"), "\n").as("kept_text"))
  }

  /** Per-source retention report over the SAME rule set: documents in/out,
    * line-level keep fraction (6dp), and the count of brace-dropped docs.
    * One partial-agg groupBy — the corpus-health readout a curation run
    * publishes next to its Gopher report. */
  def report(docs: DataFrame, idCol: String, textCol: String,
             srcCol: String, minWords: Int = 5, minKeptLines: Int = 3): DataFrame = {
    val lines = split(col(textCol), "\n")
    val kept = keptLinesCol(col(textCol), minWords)
    val brace = braceCol(col(textCol))
    val docKept = !brace && size(kept) >= minKeptLines
    docs
      .select(col(srcCol),
        size(lines).as("nl"), size(kept).as("nk"),
        brace.cast("int").as("braced"), docKept.cast("int").as("dk"))
      .groupBy(col(srcCol))
      .agg(count(lit(1)).as("docs_in"),
        sum(col("dk")).as("docs_kept"),
        sum(col("braced")).as("docs_braced"),
        round(sum(col("nk")) / sum(col("nl")), 6).as("line_keep_frac"))
  }
}
