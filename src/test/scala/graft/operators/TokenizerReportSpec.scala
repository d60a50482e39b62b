package graft.operators

import graft.SparkSpec
import graft.tables.Tables

/** Cross-family tokenizer report: shape, ratio consistency, and the
  * subword-beats-characters sanity bound. */
class TokenizerReportSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf())

  test("report emits one consistent row per family") {
    val rows = TokenizerReport.report(docs, "text").collect()
    assert(rows.map(_.getAs[String]("family")).toSeq ==
      Seq("bpe", "unigram", "wordpiece"))
    rows.foreach { r =>
      val (tw, tc, tt) = (r.getAs[Long]("total_words"),
        r.getAs[Long]("total_chars"), r.getAs[Long]("total_tokens"))
      assert(tw > 0 && tc >= tw && tt >= tw,
        "every word has >= 1 char and >= 1 token")
      assert(tt <= tc, "a token never splits below one character")
      assert(r.getAs[Double]("fertility") == tt.toDouble / tw.toDouble)
      assert(r.getAs[Double]("chars_per_token") == tc.toDouble / tt.toDouble)
      assert(r.getAs[Double]("chars_per_token") >= 1.0,
        "subword tokenizers must compress at least to the char level")
    }
  }

  test("trained merges beat pure character tokenization everywhere") {
    // chars/token strictly above 1 means multi-char pieces fire in
    // every family on this corpus
    val rows = TokenizerReport.report(docs, "text").collect()
    rows.foreach(r => assert(r.getAs[Double]("chars_per_token") > 1.0,
      s"${r.getAs[String]("family")} degenerated to char tokenization"))
  }
}
