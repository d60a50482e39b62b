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

  // ------------------------------------------------------- byte-fallback

  test("viterbiFallback: unknown chars byte-spell, known spans segment, " +
       "score carries the exact 2^-30 factors, surrogates stay whole") {
    val v = Map("ab" -> 0.5, "a" -> 0.25, "b" -> 0.25)
    val pF = Unigram.ByteFallbackProb
    val (p1, s1) = Unigram.viterbiFallback("abéab", v, 4)
    assert(p1 == List("ab", "<0xC3>", "<0xA9>", "ab"))
    assert(s1 == 0.5 * pF * 0.5)
    // all-unknown word: total, one fallback factor per char
    val (p2, s2) = Unigram.viterbiFallback("日本", v, 4)
    assert(p2 == List("<0xE6>", "<0x97>", "<0xA5>",
      "<0xE6>", "<0x9C>", "<0xAC>"))
    assert(s2 == pF * pF)
    // astral plane: ONE code point, four bytes of the valid scalar
    val smile = new String(Character.toChars(0x1F600))
    val (p3, _) = Unigram.viterbiFallback(smile, v, 4)
    assert(p3 == List("<0xF0>", "<0x9F>", "<0x98>", "<0x80>"))
  }

  test("encodeCorpusFrozen is total on unseen scripts; fallback counted") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val enc = Unigram.encodeCorpusFrozen(docs,
      Wordpiece.withUnseenScripts(docs, "doc_id", "text")).collect()
    assert(enc.nonEmpty)
    enc.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val toks = r.getAs[String]("toks_s").split(" ")
      assert(toks.length.toLong == r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("n_fallback") ==
        toks.count(_.startsWith("<0x")).toLong)
      if (id % 5 != 0)
        assert(r.getAs[Long]("n_fallback") > 0, s"doc $id: no fallback")
      else
        assert(r.getAs[Long]("n_fallback") == 0L, s"doc $id: spurious fallback")
    }
  }
}
