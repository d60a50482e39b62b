package graft.operators

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer specs: Viterbi DP rules,
  * hard-EM coverage preservation, and corpus-level invariants. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf())

  // ------------------------------------------------------------- viterbi

  test("viterbi maximizes the piece-probability product") {
    val probs = Map("a" -> 0.1, "b" -> 0.1, "ab" -> 0.5, "ba" -> 0.2)
    // "aba": ab|a (0.5*0.1=0.05) beats a|ba (0.1*0.2=0.02) and a|b|a (0.001)
    val (pieces, score) = Unigram.viterbi("aba", probs, 4)
    assert(pieces == List("ab", "a"))
    assert(score == 0.5 * 0.1)
  }

  test("viterbi tie rule prefers the longer final piece") {
    // both "ab|c" and "a|bc" score 0.2*0.2; longer LAST piece must win
    val probs = Map("a" -> 0.2, "ab" -> 0.2, "c" -> 0.2, "bc" -> 0.2)
    val (pieces, _) = Unigram.viterbi("abc", probs, 4)
    assert(pieces == List("a", "bc"), s"got $pieces")
  }

  test("viterbi falls back to characters when the word is unreachable") {
    val (pieces, score) = Unigram.viterbi("xyz", Map("a" -> 1.0), 4)
    assert(pieces == List("x", "y", "z") && score == 0.0)
  }

  test("viterbi respects maxLen") {
    val probs = Map("abcd" -> 0.9, "ab" -> 0.1, "cd" -> 0.1)
    val (pieces, _) = Unigram.viterbi("abcd", probs, 2)
    assert(pieces == List("ab", "cd"), "a 4-char piece must be ignored at maxLen 2")
  }

  // -------------------------------------------------------------- corpus

  test("train emits a normalized vocab and EM preserves corpus coverage") {
    val trained = Unigram.train(docs, "text").collect()
    assert(trained.nonEmpty)
    val probSum = trained.map(_.getAs[Double]("prob")).sum
    assert(math.abs(probSum - 1.0) < 1e-9, s"probs must sum to 1, got $probSum")
    assert(trained.forall(_.getAs[Long]("cnt") > 0L),
      "EM must prune unused pieces, never emit zero counts")
    // coverage: every corpus word segments with positive score under the
    // trained vocab (its own Viterbi path survives the EM pruning)
    val segs = Unigram.segmentWords(docs, "text").collect()
    assert(segs.nonEmpty)
    assert(segs.forall(_.getAs[Double]("score") > 0.0),
      "no corpus word may become unreachable after EM pruning")
    val vocab = trained.map(_.getAs[String]("piece")).toSet
    segs.foreach { r =>
      val pieces = r.getAs[String]("segmentation").split(" ")
      assert(pieces.forall(vocab.contains),
        s"segmentation of ${r.getAs[String]("word")} uses out-of-vocab pieces")
      assert(pieces.mkString("") == r.getAs[String]("word"),
        "pieces must concatenate back to the word")
      assert(pieces.length.toLong == r.getAs[Long]("n_pieces"))
    }
  }

  test("segmentation is invariant to input partitioning") {
    val a = Unigram.segmentWords(docs, "text")
      .collect().map(_.toString).sorted.toSeq
    val b = Unigram.segmentWords(docs.repartition(13), "text")
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("encodeCorpus token streams concatenate back to the word sequence") {
    val enc = Unigram.encodeCorpus(docs, "doc_id", "text").collect()
    assert(enc.nonEmpty)
    val source = docs.select(col("doc_id"), coalesce(col("text"), lit("")))
      .as[(Long, String)].collect().toMap
    enc.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val toks = r.getAs[String]("toks_s").split(" ")
      assert(toks.length.toLong == r.getAs[Long]("n_tokens"))
      val words = source(id).split(" ").filter(_.nonEmpty)
      assert(toks.mkString("") == words.mkString(""),
        s"doc $id: tokens must concatenate to its word characters")
    }
    // docs with at least one word all appear
    val expected = source.count(_._2.split(" ").exists(_.nonEmpty))
    assert(enc.length == expected)
  }

  test("encodeCorpus is invariant to input partitioning") {
    val a = Unigram.encodeCorpus(docs, "doc_id", "text")
      .collect().map(_.toString).sorted.toSeq
    val b = Unigram.encodeCorpus(docs.repartition(13), "doc_id", "text")
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("multi-char pieces actually win: some word segments into fewer " +
       "pieces than its character count") {
    val segs = Unigram.segmentWords(docs, "text").collect()
    assert(segs.exists(r =>
      r.getAs[Long]("n_pieces") < r.getAs[String]("word").length.toLong),
      "the trained vocab must beat pure character segmentation somewhere")
  }
}
