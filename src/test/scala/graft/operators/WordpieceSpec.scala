package graft.operators

import graft.SparkSpec
import graft.tables.Tables

/** WordPiece tokenizer specs: greedy maximal-munch rules, likelihood
  * scoring of the merge loop, and corpus-level invariants. */
class WordpieceSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf())

  // -------------------------------------------------------------- greedy

  test("greedy takes the longest matching piece at each position") {
    val vocab = Set("u", "##n", "##a", "##f", "##fa", "##b", "##l", "##e",
      "un", "##aff", "##affable", "##ffable")
    // "unaffable" -> un ##affable (maximal munch at both positions)
    assert(Wordpiece.greedy("unaffable", vocab, 12) ==
      List("un", "##affable"))
  }

  test("greedy honors the ## continuation boundary") {
    // "aa": initial "a" matches but continuation needs "##a"
    assert(Wordpiece.greedy("aa", Set("a", "##a"), 8) == List("a", "##a"))
    // a word-initial piece is never ##-prefixed even if only ##aa exists
    assert(Wordpiece.greedy("aab", Set("a", "##a", "##b", "##ab"), 8) ==
      List("a", "##ab"))
  }

  test("greedy respects maxLen") {
    val vocab = Set("abcd", "ab", "##cd", "##c", "##d", "a", "##b")
    assert(Wordpiece.greedy("abcd", vocab, 2) == List("ab", "##cd"))
  }

  // -------------------------------------------------------------- corpus

  test("trainMerges emits likelihood-consistent rounds") {
    val merges = Wordpiece.trainMerges(docs, "text", nMerges = 6).collect()
    assert(merges.nonEmpty && merges.length <= 6)
    merges.foreach { r =>
      val (n, na, nb) = (r.getAs[Long]("n_pair"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"))
      assert(n > 0 && na >= n && nb >= n,
        "a pair cannot outnumber either of its symbols")
      assert(r.getAs[Double]("score") ==
        n.toDouble / na.toDouble / nb.toDouble,
        "score must be the exact fixed-order double division")
    }
    assert(merges.map(_.getAs[Int]("round")).toSeq == (1 to merges.length),
      "rounds must be consecutive from 1")
  }

  test("segmentWords reconstructs every word and stays in-vocab shape") {
    val segs = Wordpiece.segmentWords(docs, "text").collect()
    assert(segs.nonEmpty)
    segs.foreach { r =>
      val word = r.getAs[String]("word")
      val pieces = r.getAs[String]("pieces_s").split(" ")
      assert(pieces.head == word.substring(0, pieces.head.length),
        "first piece must be un-prefixed")
      assert(pieces.tail.forall(_.startsWith("##")),
        s"non-initial pieces of $word must carry ##")
      assert(pieces.map(_.stripPrefix("##")).mkString("") == word,
        s"pieces must concatenate back to $word")
      assert(pieces.length.toLong == r.getAs[Long]("n_pieces"))
    }
    // encode covers the 1-char words training drops
    assert(segs.exists(_.getAs[String]("word").length == 1) ||
      segs.forall(_.getAs[String]("word").length > 1))
  }

  test("segmentation is invariant to input partitioning") {
    val a = Wordpiece.segmentWords(docs, "text")
      .collect().map(_.toString).sorted.toSeq
    val b = Wordpiece.segmentWords(docs.repartition(13), "text")
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("encodeCorpus token streams strip to the doc's word characters") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val enc = Wordpiece.encodeCorpus(docs, "doc_id", "text").collect()
    assert(enc.nonEmpty)
    val source = docs.select(col("doc_id"), coalesce(col("text"), lit("")))
      .as[(Long, String)].collect().toMap
    enc.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val toks = r.getAs[String]("toks_s").split(" ")
      assert(toks.length.toLong == r.getAs[Long]("n_tokens"))
      val words = source(id).toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
      assert(toks.map(_.stripPrefix("##")).mkString("") == words.mkString(""),
        s"doc $id: de-prefixed tokens must concatenate to its word chars")
    }
  }

  test("merged pieces actually fire: some segmentation is shorter than " +
       "its character count") {
    val segs = Wordpiece.segmentWords(docs, "text").collect()
    assert(segs.exists(r =>
      r.getAs[Long]("n_pieces") < r.getAs[String]("word").length.toLong),
      "the learned merges must beat pure character segmentation somewhere")
  }

  // ------------------------------------------------------- byte-fallback

  test("greedy byte-fallback: unknown chars emit UTF-8 bytes, known spans " +
       "keep segmenting, surrogate pairs stay whole") {
    val v = Set("d", "##o", "##n", "##e", "##s")
    assert(Wordpiece.greedy("données", v, 8, byteFallback = true) ==
      List("d", "##o", "##n", "##n", "<0xC3>", "<0xA9>", "##e", "##s"))
    assert(Wordpiece.greedy("日", v, 8, byteFallback = true) ==
      List("<0xE6>", "<0x97>", "<0xA5>"))
    // non-BMP (surrogate pair): one code point -> FOUR bytes, total
    val smile = new String(Character.toChars(0x1F600))
    assert(Wordpiece.greedy(smile, v, 8, byteFallback = true) ==
      List("<0xF0>", "<0x9F>", "<0x98>", "<0x80>"))
  }

  test("encodeCorpusFrozen is total on unseen scripts; fallback counted") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val enc = Wordpiece.encodeCorpusFrozen(docs,
      Wordpiece.withUnseenScripts(docs, "doc_id", "text")).collect()
    val decorated = Wordpiece.withUnseenScripts(docs, "doc_id", "text")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toMap
    assert(enc.nonEmpty)
    enc.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val toks = r.getAs[String]("toks_s").split(" ")
      assert(toks.length.toLong == r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("n_fallback") ==
        toks.count(_.startsWith("<0x")).toLong)
      // decorated (m != 0) docs MUST take the fallback path; raw (m == 0)
      // docs must not (their chars are the training alphabet)
      if (id % 5 != 0)
        assert(r.getAs[Long]("n_fallback") > 0, s"doc $id: no fallback")
      else
        assert(r.getAs[Long]("n_fallback") == 0L, s"doc $id: spurious fallback")
      // totality + reversibility: decoding the piece stream (strip ##,
      // un-hex the byte pieces) reproduces the doc's word characters
      val bytes = scala.collection.mutable.ArrayBuffer.empty[Byte]
      toks.foreach { t =>
        if (t.startsWith("<0x"))
          bytes += Integer.parseInt(t.substring(3, 5), 16).toByte
        else bytes ++= t.stripPrefix("##")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      }
      val words = decorated(id).toLowerCase
        .split("[^\\p{L}]+").filter(_.nonEmpty)
      assert(new String(bytes.toArray,
          java.nio.charset.StandardCharsets.UTF_8) == words.mkString(""),
        s"doc $id: decoded pieces must reproduce the word characters")
    }
  }
}
