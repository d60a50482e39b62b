package graft.operators

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("bpe merge training on a hand-checked corpus") {
    val docs = Seq("ab ab ab", "abc").toDF("text")
    val (merges, vocab) = Bpe.trainWithVocab(docs, "text", nMerges = 2)
    val m = merges.collect().map(r =>
      (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // round 1: (a,b) seen 3 (in "ab") + 1 (in "abc") = 4 beats (b,c) = 1;
    // round 2: the only remaining pair is (ab, c).
    assert(m == Seq((1, "a", "b", 4L), (2, "ab", "c", 1L)))
    val reprs = vocab.orderBy("w").select("w", "repr")
      .as[(String, String)].collect().toSeq
    assert(reprs == Seq(("ab", "ab"), ("abc", "abc")))
  }

  test("overlapping run merges greedily left-to-right to the fixpoint") {
    val docs = Seq("aaaa").toDF("text")
    val (merges, vocab) = Bpe.trainWithVocab(docs, "text", nMerges = 1)
    val m = merges.collect().map(r =>
      (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(m == Seq((1, "a", "a", 3L)))
    // greedy BPE on [a,a,a,a] = [aa,aa] — the first global replace pass
    // takes occurrences 1 and 3 (the shared space blocks 2), the second
    // pass takes the survivor.
    assert(vocab.select("repr").as[String].collect().toSeq == Seq("aa aa"))
  }

  test("training stops when every word is one symbol") {
    val docs = Seq("ab ab").toDF("text")
    val merges = Bpe.trainMerges(docs, "text", nMerges = 5)
    val m = merges.collect().map(r =>
      (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(m == Seq((1, "a", "b", 2L)))
  }

  test("tokenStats segments the corpus with the learned merges") {
    // after 1 merge on "ab ab ab abc": merge (a,b); tokens: ab×4, c×1
    val docs = Seq("ab ab ab abc").toDF("text")
    val out = Bpe.tokenStats(docs, "text", nMerges = 1, topK = 10)
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("ab", 4L), ("c", 1L)))
  }

  test("encodeCorpus segments documents scan-side: merges stop at word " +
       "boundaries, 1-char words kept, null-safe") {
    // corpus trains merge (a,b); doc 2's "...a b..." split across words
    // must NOT merge, and encode keeps the 1-char words training drops
    val docs = Seq(
      (1L, "ab ab abc"),
      (2L, "xa bx a b"),
      (3L, null: String)).toDF("doc_id", "text")
    val out = Bpe.encodeCorpus(docs, "doc_id", "text", nMerges = 1)
      .as[(Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 4L, "ab ab ab c"),        // merged inside words
      (2L, 6L, "x a b x a b"),       // never across the word boundary
      (3L, 0L, "")))
  }

  test("byte-level training: multi-byte pairs win merges the ASCII family " +
       "cannot see") {
    // 日 = e6 97 a5, 本 = e6 9c ac; "日本" repeated dominates the corpus
    val docs = Seq("日本 日本 日本", "日本 cat").toDF("text")
    val merges = Bpe.trainMergesBytes(docs, "text", nMerges = 2)
    val m = merges.collect().map(r =>
      (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // round 1: within-word adjacent byte pairs of 日本 each appear 4x,
    // tie-break (count desc, a asc, b asc) picks the lexicographically
    // first: ("97","a5") < ("9c","ac") < ("a5","e6") < ("e6","97") <
    // ("e6","9c"); round 2: ("e6","97a5") also 4x, again first by order
    assert(m.head == ((1, "97", "a5", 4L)))
    assert(m(1)._4 == 4L) // second merge still a 4-count multi-byte pair
  }

  test("byte-level encode round-trips: unhexed token stream equals the " +
       "whitespace-normalized text") {
    val docs = Seq(
      (1L, "héllo wörld"),
      (2L, "日本語 データ processing"),
      (3L, "plain  ascii\ttext"),
      (4L, null: String)).toDF("doc_id", "text")
    val out = Bpe.encodeCorpusBytes(docs, "doc_id", "text", nMerges = 3)
      .as[(Long, Long, String)].collect().toSeq
    val expect = Map(
      1L -> "héllowörld", 2L -> "日本語データprocessing",
      3L -> "plainasciitext", 4L -> "")
    out.foreach { case (id, n, toks) =>
      val bytes = toks.split(" ").filter(_.nonEmpty).mkString("")
        .grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
      assert(new String(bytes, "UTF-8") == expect(id),
        s"doc $id round-trip")
      if (id == 4L) assert(n == 0L) else assert(n >= 1L)
    }
    // merges never cross the whitespace boundary: doc 3's token count
    // is at least the 3 words' worth of symbols after 3 merges
    assert(out.find(_._1 == 3L).get._2 >= 3L)
    // determinism under partitioning (the sampling-family discipline)
    val out2 = Bpe.encodeCorpusBytes(docs.repartition(5), "doc_id",
      "text", nMerges = 3).as[(Long, Long, String)].collect().toSeq
    assert(out2.sortBy(_._1) == out.sortBy(_._1))
  }

  test("ASCII tokenization rule: folds case, non-letters separate, null-safe") {
    val docs = Seq("Ab aB", null, "a1b cD2").toDF("text")
    // words: ab, ab, cd ("a1b" splits to 1-char fragments, dropped)
    val (merges, vocab) = Bpe.trainWithVocab(docs, "text", nMerges = 1)
    val m = merges.collect().map(r =>
      (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(m == Seq((1, "a", "b", 2L)))
    assert(vocab.orderBy("w").select("w").as[String].collect().toSeq ==
      Seq("ab", "cd"))
  }
}
