package graft.operators

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** Specs for the r6 training-pipeline operators: deterministic sampling,
  * sequence packing, benchmark decontamination, and the declarative
  * multimodal resize/frame stages. */
class TrainingOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf())
    .withColumn("text", coalesce(col("text"), lit("")))

  // ------------------------------------------------------------- sampling

  test("bernoulli sample is deterministic and partitioning-invariant") {
    val a = Sampling.bernoulli(docs, "doc_id", 0.25).select("doc_id")
      .as[Long].collect().sorted.toSeq
    val b = Sampling.bernoulli(docs.repartition(13), "doc_id", 0.25)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b, "sample membership must not depend on partitioning")
    assert(a.nonEmpty && a.size < docs.count())
  }

  test("bernoulli fraction lands near the target and seeds are independent") {
    val n = docs.count().toDouble
    val k = Sampling.bernoulli(docs, "doc_id", 0.5).count().toDouble
    assert(math.abs(k / n - 0.5) < 0.15, s"got ${k / n}, wanted ~0.5")
    val s1 = Sampling.bernoulli(docs, "doc_id", 0.5, seed = "a")
      .select("doc_id").as[Long].collect().toSet
    val s2 = Sampling.bernoulli(docs, "doc_id", 0.5, seed = "b")
      .select("doc_id").as[Long].collect().toSet
    assert(s1 != s2, "different seeds must draw different samples")
  }

  test("bernoulli sample is monotone in the fraction (nested samples)") {
    val small = Sampling.bernoulli(docs, "doc_id", 0.125)
      .select("doc_id").as[Long].collect().toSet
    val big = Sampling.bernoulli(docs, "doc_id", 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(small.subsetOf(big),
      "threshold sampling must nest: frac f ⊆ frac g for f <= g")
  }

  test("stratified sampling applies per-stratum fractions") {
    val out = Sampling.stratified(docs, "doc_id", "lang",
      fractions = Map("en" -> 1.0, "de" -> 0.0), defaultFrac = 0.0)
    val langs = out.select("lang").distinct().as[String].collect().toSet
    assert(langs == Set("en"), s"keep-all en, drop rest; got $langs")
    assert(out.count() == docs.filter(col("lang") === "en").count())
  }

  test("exactPerStratum returns min(n, stratum size) rows per stratum") {
    val n = 5
    val out = Sampling.exactPerStratum(docs, "doc_id", "lang", n)
    val got = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    val want = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
      .map { case (l, c) => l -> math.min(c, n.toLong) }
    assert(got == want)
    // deterministic: same cut twice
    val again = Sampling.exactPerStratum(docs, "doc_id", "lang", n)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(again == out.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  // -------------------------------------------------------------- packing

  test("packSequences lays out contiguous per-bucket token streams") {
    val out = Packing.packSequences(docs, "doc_id", "text",
      budget = 512, buckets = 8).cache()
    try {
      // every non-empty doc appears exactly once
      val nonEmpty = docs.filter(regexp_count(col("text"), lit("\\S+")) > 0).count()
      assert(out.count() == nonEmpty)
      // contiguity: within a bucket, tok_start == sum of preceding n_tokens
      val rows = out.select("bucket", "doc_id", "n_tokens", "tok_start")
        .as[(Long, Long, Long, Long)].collect()
        .groupBy(_._1).values
      rows.foreach { bucket =>
        var expected = 0L
        bucket.sortBy(_._2).foreach { case (_, _, n, start) =>
          assert(start == expected, s"gap/overlap at tok_start $start")
          expected = start + n
        }
      }
      // chunk accounting: a doc spans exactly the windows its span covers
      val bad = out.filter(
        col("chunks_spanned") =!=
          expr("(tok_start + n_tokens - 1) div 512") - col("chunk_id") + 1)
        .count()
      assert(bad == 0)
    } finally out.unpersist()
  }

  test("packSequences chunk ids cover the stream with no empty windows") {
    val out = Packing.packSequences(docs, "doc_id", "text",
      budget = 128, buckets = 4)
    // per bucket: union of [chunk_id, chunk_id + spanned) must be a
    // contiguous 0..max range — no window can be skipped by construction
    val perBucket = out.groupBy("bucket")
      .agg(max(col("chunk_id") + col("chunks_spanned") - 1).as("hi"),
        sum(col("n_tokens")).as("toks")).as[(Long, Long, Long)].collect()
    perBucket.foreach { case (_, hi, toks) =>
      assert(hi == (toks - 1) / 128, "last window index must match total tokens")
    }
  }

  test("packBestFit replays textbook FFD exactly and respects the budget") {
    val budget = 96
    val out = Packing.packBestFit(docs, "doc_id", "text", budget, buckets = 4)
      .as[(Long, Long, Long, Long)].collect()
    // local single-threaded FFD over the same (n desc, id) order per bucket
    val expect = out.map(r => (r._1, r._2, r._3)).toSeq
      .groupBy(_._2).flatMap { case (bucket, ds) =>
        val bins = scala.collection.mutable.ArrayBuffer.empty[Long]
        var neg = 0L
        ds.sortBy(d => (-d._3, d._1)).map { case (id, _, n) =>
          if (n > budget) { neg -= 1; (id, neg) }
          else {
            var i = 0
            while (i < bins.length && bins(i) < n) i += 1
            if (i == bins.length) bins += (budget - n) else bins(i) -= n
            (id, (i + 1).toLong)
          }
        }
      }.toMap
    assert(out.nonEmpty && out.exists(_._4 < 0),
      "fixture must exercise the oversize branch (docs run up to 99 tokens)")
    out.foreach { case (id, _, _, bin) =>
      assert(bin == expect(id), s"doc $id: got bin $bin, FFD says ${expect(id)}")
    }
    // no bin overfull
    val fill = out.filter(_._4 > 0).groupBy(r => (r._2, r._4)).map(_._2.map(_._3).sum)
    assert(fill.forall(_ <= budget), "a bin exceeded the token budget")
    // partitioning-invariant
    val again = Packing.packBestFit(docs.repartition(13), "doc_id", "text",
      budget, buckets = 4).as[(Long, Long, Long, Long)].collect().toSet
    assert(again == out.toSet, "layout must not depend on input partitioning")
  }

  test("FirstFitBins segment tree equals the linear first-fit probe") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 20) {
      val budget = 50 + rnd.nextInt(200)
      val tree = new FirstFitBins(budget)
      val bins = scala.collection.mutable.ArrayBuffer.empty[Long]
      for (_ <- 1 to 2000) {
        val n = 1L + rnd.nextInt(budget)
        var i = 0
        while (i < bins.length && bins(i) < n) i += 1
        if (i == bins.length) bins += (budget - n) else bins(i) -= n
        assert(tree.place(n) == i, s"trial $trial: tree diverged from linear probe")
      }
      assert(tree.size == bins.length)
      bins.indices.foreach(i => assert(tree.remaining(i) == bins(i)))
    }
  }

  test("packReport accounts every token and shows the waste/seam tradeoff") {
    val rep = Packing.packReport(docs, "doc_id", "text", budget = 96, buckets = 4)
      .collect()
    assert(rep.nonEmpty)
    rep.foreach { r =>
      val (tokens, ffdBins, ffdSlack) =
        (r.getAs[Long]("tokens"), r.getAs[Long]("ffd_bins"), r.getAs[Long]("ffd_slack"))
      assert(ffdBins * 96 - tokens == ffdSlack)
      val frac = r.getAs[Double]("ffd_waste_frac")
      assert(frac >= 0.0 && frac < 1.0)
      // concat packs denser (slack < one bin) but pays in seam docs;
      // FFD never splits a non-oversize doc, paying slack instead
      assert(r.getAs[Long]("concat_slack") < 96)
      assert(r.getAs[Long]("ffd_bins") >= r.getAs[Long]("concat_chunks"))
    }
  }

  // ------------------------------------------------------- decontaminate

  test("decontaminate flags a planted benchmark copy and clean() drops it") {
    val corpus = docs.filter(col("doc_id") % 11 =!= 0)
    val bench = docs.filter(col("doc_id") % 11 === 0)
    // plant: a corpus doc that IS a benchmark doc (verbatim leak)
    val leaked = bench.limit(1).select((col("doc_id") + 1000000L).as("doc_id"),
      col("text"), col("lang"), col("source"), col("n_chars"))
    val corpusLeaky = corpus.unionByName(leaked)
    val rep = Decontaminate.report(corpusLeaky, bench, "doc_id", "text",
      w = 5, minShared = 1).cache()
    try {
      val flagged = rep.select("doc_id").as[Long].collect().toSet
      assert(flagged.exists(_ >= 1000000L), "verbatim leak must be flagged")
      val cleaned = Decontaminate.clean(corpusLeaky, bench, "doc_id", "text",
        w = 5, minShared = 1)
      assert(cleaned.filter(col("doc_id") >= 1000000L).count() == 0)
      assert(cleaned.count() == corpusLeaky.count() - rep.count())
    } finally rep.unpersist()
  }

  test("decontaminate minShared is monotone and respects the threshold") {
    val corpus = docs.filter(col("doc_id") % 11 =!= 0)
    val bench = docs.filter(col("doc_id") % 11 === 0)
    val r1 = Decontaminate.report(corpus, bench, "doc_id", "text", w = 3, minShared = 3)
    val r2 = Decontaminate.report(corpus, bench, "doc_id", "text", w = 3, minShared = 8)
    val ids1 = r1.select("doc_id").as[Long].collect().toSet
    val ids2 = r2.select("doc_id").as[Long].collect().toSet
    assert(ids2.subsetOf(ids1))
    assert(r1.filter(col("n_shared") < 3).count() == 0)
  }

  test("cutContaminated excises exactly the benchmark-colliding spans") {
    // bench holds "a b c d e"; corpus doc 1 embeds it mid-text, doc 2 is
    // clean, doc 3 embeds two separated copies (two runs)
    val bench = Seq((100L, "z z a b c d e z z")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "u v a b c d e w x"),
      (2L, "u v w x y u v w x"),
      (3L, "a b c d e u u u a b c d e")).toDF("doc_id", "text")
    val got = Decontaminate.cutContaminated(corpus, bench, "doc_id", "text",
        w = 5)
      .select("doc_id", "n_tokens", "n_cut_tokens", "n_runs", "text_cut")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    // doc 1: also matches "z z a b c"? no — corpus has "u v a b c".
    // Only the exact 5-gram "a b c d e" (and bench grams containing it)
    // can collide; bench grams are windows of its own text, and the only
    // one present in doc 1 is "a b c d e" itself.
    assert(got == Seq(
      (1L, 9L, 5L, 1L, "u v w x"),
      (2L, 9L, 0L, 0L, "u v w x y u v w x"),
      (3L, 13L, 10L, 2L, "u u u")), s"got $got")
  }

  test("cutContaminated agrees with report: cut docs == flagged docs, " +
      "and a doc-level benchmark copy is fully erased") {
    val corpus0 = docs.filter(col("doc_id") % 11 =!= 0)
    val bench = docs.filter(col("doc_id") % 11 === 0)
    val leaked = bench.limit(1).select((col("doc_id") + 1000000L).as("doc_id"),
      col("text"), col("lang"), col("source"), col("n_chars"))
    val corpus = corpus0.unionByName(leaked)
    val cut = Decontaminate.cutContaminated(corpus, bench, "doc_id", "text",
      w = 5).cache()
    try {
      val cutIds = cut.filter(col("n_cut_tokens") > 0)
        .select("doc_id").as[Long].collect().toSet
      val flaggedIds = Decontaminate.report(corpus, bench, "doc_id", "text",
        w = 5, minShared = 1).select("doc_id").as[Long].collect().toSet
      assert(cutIds == flaggedIds, "span surgery and doc flagging disagree")
      val erased = cut.filter(col("doc_id") >= 1000000L)
        .select("cut_frac", "text_cut").as[(Double, String)].collect()
      assert(erased.toSeq == Seq((1.0, "")), "verbatim leak must vanish")
      assert(cut.count() == corpus.count(), "every corpus doc gets a row")
    } finally cut.unpersist()
  }

  // ------------------------------------------------------- span corrupt

  test("spanCorrupt: sentinels round-trip — splicing targets back into " +
      "inputs reconstructs every original document") {
    val docs = Tables.documents(spark, sf())
    val out = Denoise.spanCorrupt(docs, "doc_id", "text", w = 3,
        thr16 = 4096L)
      .select("doc_id", "n_tokens", "n_corrupt", "n_spans", "input_s",
        "target_s")
      .as[(Long, Long, Long, Long, String, String)].collect().toSeq
    val original = docs.select(col("doc_id"),
        coalesce(col("text"), lit(""))).as[(Long, String)].collect().toMap
    assert(out.exists(_._4 > 0), "fixture must actually corrupt something")
    assert(out.exists(_._4 == 0), "some docs must pass through untouched")
    out.foreach { case (id, nTok, nCorrupt, nSpans, input, target) =>
      val inToks = input.split(" ", -1)
      assert(inToks.count(_.startsWith("<extra_id_")) == nSpans)
      assert(inToks.length - nSpans + nCorrupt == nTok,
        s"doc $id token accounting broken")
      // parse target into span k -> tokens
      val spans = scala.collection.mutable.Map.empty[Int, Vector[String]]
      var cur = -1
      target.split(" ", -1).filter(_.nonEmpty).foreach { t =>
        if (t.startsWith("<extra_id_")) {
          cur = t.stripPrefix("<extra_id_").stripSuffix(">").toInt
          spans(cur) = Vector()
        } else spans(cur) = spans(cur) :+ t
      }
      val rebuilt = inToks.flatMap { t =>
        if (t.startsWith("<extra_id_")) {
          val k = t.stripPrefix("<extra_id_").stripSuffix(">").toInt
          spans(k)
        } else Seq(t)
      }.mkString(" ")
      assert(rebuilt == original(id), s"doc $id does not round-trip")
    }
  }

  test("spanCorrupt merges adjacent spans and never corrupts short docs") {
    val out = Denoise.spanCorrupt(
      Seq((1L, "a b"), (2L, "a b c d e f g h i j")).toDF("doc_id", "text"),
      "doc_id", "text", w = 3, thr16 = 65535L) // flag every position
      .select("doc_id", "n_corrupt", "n_spans", "input_s", "target_s")
      .as[(Long, Long, Long, String, String)].collect().sortBy(_._1).toSeq
    // doc 1 is shorter than w -> untouched; doc 2: every start flagged ->
    // one merged run covering all 10 tokens, one sentinel
    assert(out(0) == (1L, 0L, 0L, "a b", ""))
    assert(out(1) == (2L, 10L, 1L, "<extra_id_0>",
      "<extra_id_0> a b c d e f g h i j"), s"got ${out(1)}")
  }

  // ------------------------------------------------------------ FIM

  test("fimTransform: psm docs reorder to prefix/suffix/middle losslessly") {
    val docs = Tables.documents(spark, sf())
    val out = Denoise.fimTransform(docs, "doc_id", "text", thr16 = 32768L,
        minTokens = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4), r.getString(5))).toSeq
    val original = docs.select(col("doc_id"),
        coalesce(col("text"), lit(""))).as[(Long, String)].collect().toMap
    val psm = out.filter(_._3 == "psm")
    assert(psm.nonEmpty && psm.size < out.size,
      "rate 1/2 must split the corpus both ways")
    psm.foreach { case (id, nTok, _, p1, p2, fim) =>
      val t = original(id).split(" ", -1)
      assert(0L <= p1 && p1 <= p2 && p2 <= nTok)
      val expect = (Seq("<PRE>") ++ t.slice(0, p1.toInt) ++ Seq("<SUF>") ++
        t.slice(p2.toInt, t.length) ++ Seq("<MID>") ++
        t.slice(p1.toInt, p2.toInt)).mkString(" ")
      assert(fim == expect, s"doc $id PSM splice mismatch")
    }
    out.filter(_._3 == "plain").foreach { case (id, _, _, p1, p2, fim) =>
      assert(fim == original(id) && p1 == -1L && p2 == -1L)
    }
  }

  // ------------------------------------------------------------ datacard

  test("dataCard bySource: hand-computed volumes, dup mass, lang mix, ties") {
    val df = Seq(
      (1L, "a b c", "en", "A"),   // dup pair with doc 2
      (2L, "a b c", "en", "A"),
      (3L, "x", "de", "A"),       // short under shortTokens = 2
      (4L, "p q", "en", "B"),     // B: en/de tie -> top_lang = min = "de"
      (5L, "r s", "de", "B")).toDF("doc_id", "text", "lang", "source")
    val got = DataCard.bySource(df, "source", "lang", "text", shortTokens = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5), r.getLong(6),
        r.getString(7), r.getDouble(8), r.getDouble(9))).toSeq
    assert(got == Seq(
      ("A", 3L, 7L, 11L, 2.33, 0.3333, 2L, "en", 0.6667, 0.3333),
      ("B", 2L, 4L, 6L, 2.0, 0.0, 2L, "de", 0.5, 0.0)), s"got $got")
  }

  // --------------------------------------------------- token-budget take

  private def jvmKey(seed: String, id: Long): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s"$seed|$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 4)
  }

  test("takeTokenBudget: maximal prefix in key order, never over budget") {
    val data = Tables.documents(spark, sf())
      .select(col("doc_id"), col("source"),
        size(split(coalesce(col("text"), lit("")), " ")).cast("long"))
      .as[(Long, String, Long)].collect().toSeq
    val budget = 2000L
    val got = Sampling.takeTokenBudget(Tables.documents(spark, sf()),
        "doc_id", "text", "source", budget)
      .select("doc_id", "source", "n_tok", "cum_tok")
      .as[(Long, String, Long, Long)].collect().toSeq
    // brute force: the longest per-source prefix (in (key, id) order)
    // whose running total stays <= budget — the cumulative sum includes
    // every doc in order, so nothing re-enters after the first crossing
    val expect = data.groupBy(_._2).toSeq.flatMap { case (src, rows) =>
      val sorted = rows.sortBy(r => (jvmKey("s42", r._1), r._1))
      val cums = sorted.scanLeft(0L)(_ + _._3).tail
      sorted.zip(cums).filter(_._2 <= budget)
        .map { case (r, c) => (r._1, src, r._3, c) }
    }
    assert(got.toSet == expect.toSet, "windowed prefix mismatch")
    assert(got.groupBy(_._2).values.forall(_.map(_._3).sum <= budget))
  }

  test("takeTokenBudgetRate: exact threshold membership; small sources keep all") {
    val docs = Tables.documents(spark, sf())
    val budget = 2000L
    val data = docs.select(col("doc_id"), col("source"),
        size(split(coalesce(col("text"), lit("")), " ")).cast("long"))
      .as[(Long, String, Long)].collect().toSeq
    val totals = data.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val got = Sampling.takeTokenBudgetRate(docs, "doc_id", "text", "source",
        budget).select("doc_id").as[Long].collect().toSet
    val expect = data.filter { case (id, src, _) =>
      val thr = math.min(65536L, budget * 65536L / totals(src))
      thr >= 65536L || java.lang.Long.parseLong(jvmKey("s42", id), 16) < thr
    }.map(_._1).toSet
    assert(got == expect, "rate membership must be the exact integer rule")
    // a tiny source (fewer total tokens than the budget) is kept whole
    val tiny = Seq((1L, "only three tokens", "small"),
      (2L, "a b", "small")).toDF("doc_id", "text", "source")
    assert(Sampling.takeTokenBudgetRate(tiny, "doc_id", "text", "source",
      budget).count() == 2)
  }

  test("takeTokenBudgetRate rejects budgets past the 2^16 fixed-point range") {
    val tiny = Seq((1L, "a b c", "s")).toDF("doc_id", "text", "source")
    intercept[IllegalArgumentException] {
      Sampling.takeTokenBudgetRate(tiny, "doc_id", "text", "source",
        Long.MaxValue / 65536L + 1L)
    }
    // the largest admissible budget still runs (threshold saturates)
    assert(Sampling.takeTokenBudgetRate(tiny, "doc_id", "text", "source",
      Long.MaxValue / 65536L).count() == 1)
  }

  // ------------------------------------------------- cluster best/mixture

  test("bestPerCluster keeps the max-quality member, ties to min id") {
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "cluster_id")
    val quality = Seq((1L, 5L), (2L, 9L), (3L, 9L), (10L, 4L), (11L, 4L))
      .toDF("qid", "q")
    val out = Dedup.bestPerCluster(labels, "doc_id", "cluster_id",
      quality, "qid", "q")
      .select("cluster_id", "rep_id", "n_members")
      .as[(Long, Long, Long)].collect().toSet
    // cluster 1: docs 2 and 3 tie at q=9 → min id 2; cluster 10: tie → 10
    assert(out == Set((1L, 2L, 3L), (10L, 10L, 2L)))
  }

  test("mixtureWeights sums to ~1 and counts every doc") {
    val out = TextAnalysis.mixtureWeights(docs, "text", Seq("lang")).cache()
    try {
      val wSum = out.agg(sum("weight")).as[Double].head()
      assert(math.abs(wSum - 1.0) < 1e-4, s"weights sum to $wSum")
      assert(out.agg(sum("n_docs")).as[Long].head() == docs.count())
    } finally out.unpersist()
  }

  // ----------------------------------------------------------- multimodal

  test("resizePlan fits dims inside the box preserving aspect (integer)") {
    val out = Multimodal.resizePlan(
      Multimodal.syntheticContainers(docs, "doc_id"),
      "doc_id", "payload", maxW = 256, maxH = 160)
    assert(out.filter(col("out_w") > 256 || col("out_h") > 160 ||
      col("out_w") < 1 || col("out_h") < 1).count() == 0)
    // one side is always pinned to the box
    assert(out.filter(col("out_w") =!= 256 && col("out_h") =!= 160).count() == 0)
    // integer aspect bound: |out_w/out_h - w/h| shrinks as floor error only
    val bad = out.filter(
      abs(col("out_w") * col("height") - col("out_h") * col("width"))
        > greatest(col("width"), col("height"))).count()
    assert(bad == 0, "aspect drift beyond floor rounding")
  }

  test("frameOffsets slices reassemble to the payload when stride == frameSize") {
    val cont = Multimodal.syntheticContainers(docs.limit(100), "doc_id")
    val out = Multimodal.frameOffsets(cont, "doc_id", "payload",
      frameSize = 8, stride = 8, maxFrames = 1000)
    // sort INSIDE the aggregate — collect_list order is not defined by a
    // pre-groupBy orderBy
    val rebuilt = out.groupBy("doc_id").agg(
      array_join(transform(
        array_sort(collect_list(struct(col("frame_idx"), col("frame_hex")))),
        x => x("frame_hex")), "").as("hx"))
    val direct = cont.select(col("doc_id"), lower(hex(col("payload"))).as("hx"))
    assert(rebuilt.join(direct, "doc_id")
      .filter(rebuilt("hx") =!= direct("hx")).count() == 0,
      "concatenated frames must equal the original payload")
  }

  test("frameOffsets respects maxFrames and emits correct lengths") {
    val cont = Multimodal.syntheticContainers(docs, "doc_id")
    val out = Multimodal.frameOffsets(cont, "doc_id", "payload",
      frameSize = 16, stride = 11, maxFrames = 2)
    assert(out.groupBy("doc_id").count().filter(col("count") > 2).count() == 0)
    assert(out.filter(length(col("frame_hex")) =!= col("frame_len") * 2).count() == 0)
    assert(out.filter(col("frame_len") <= 0 || col("frame_len") > 16).count() == 0)
  }

  // --------------------------------------------------------- epochShuffle

  test("epochShuffle is a permutation: valid shards, dense per-shard pos") {
    val out = Sampling.epochShuffle(docs, "doc_id", shards = 8).cache()
    try {
      assert(out.count() == docs.count(), "join back by id must be 1:1")
      assert(out.filter(col("shard") < 0 || col("shard") >= 8).count() == 0)
      // pos is 1..n dense within each shard
      val perShard = out.groupBy("shard")
        .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"),
          countDistinct("pos").as("d"))
      assert(perShard.filter(col("mx") =!= col("n") || col("mn") =!= 1 ||
        col("d") =!= col("n")).count() == 0, "pos must be dense 1..n")
      // payload columns survive the narrow-rank + rejoin
      assert(out.columns.contains("text") && out.columns.contains("lang"))
    } finally out.unpersist()
  }

  test("epochShuffle deals the same order on any partitioning, new order per seed") {
    def order(df: org.apache.spark.sql.DataFrame, seed: String) =
      Sampling.epochShuffle(df, "doc_id", seed = seed, shards = 4)
        .select("doc_id", "shard", "pos").as[(Long, Long, Long)]
        .collect().sortBy(_._1).toSeq
    val a = order(docs, "e1")
    val b = order(docs.repartition(17), "e1")
    assert(a == b, "epoch order must not depend on cluster layout")
    val c = order(docs, "e2")
    assert(a != c, "a fresh seed must deal a fresh permutation")
  }

  test("epochShuffle shard counts beyond 65536 are accepted and consistent") {
    // lifting the old 16-bit cap: 2^20 shards must still give the same
    // LEADING-BIT prefix relation — a row's shard at 2^20 shards, shifted
    // down 16 bits, is its shard at 16 shards
    val sub = docs.filter(col("doc_id") < 200)
    val fine = Sampling.epochShuffle(sub, "doc_id", shards = 1 << 20)
      .select(col("doc_id"), col("shard").as("s_fine"))
    intercept[IllegalArgumentException] {
      Sampling.epochShuffle(docs, "doc_id", shards = 12) // not a power of 2
    }
    val joined = Sampling.epochShuffle(sub, "doc_id", shards = 16)
      .select(col("doc_id"), col("shard").as("s_coarse")).join(fine, "doc_id")
    assert(joined.filter(shiftright(col("s_fine"), 16) =!= col("s_coarse"))
      .count() == 0, "finer shards must refine coarser ones")
  }

  // --------------------------------------------- hash-prefiltered decontam

  test("hash prefilter returns exactly the exact path's report, even gated") {
    val corpus = docs.filter(col("doc_id") % 11 =!= 0)
    val bench = docs.filter(col("doc_id") % 11 === 0)
    val exact = Decontaminate.report(corpus, bench, "doc_id", "text",
      w = 5, minShared = 1)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    // forced past BOTH gates (strings and hashes shuffle)
    val forced = Decontaminate.reportHashPrefiltered(corpus, bench, "doc_id",
      "text", w = 5, minShared = 1, maxBroadcast = 0L)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(forced == exact && exact.nonEmpty)
    // default gates
    val dflt = Decontaminate.reportHashPrefiltered(corpus, bench, "doc_id",
      "text", w = 5, minShared = 1)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(dflt == exact)
  }

  test("hash gate admits 5x the string gate: hashes broadcast, strings shuffle") {
    val corpus = docs.filter(col("doc_id") % 11 =!= 0)
    val bench = docs.filter(col("doc_id") % 11 === 0)
    // pick a gate below the benchmark's n-gram count but above n/5: the
    // string relation must NOT broadcast while the hash set still does
    val n = bench.select(explode(
      graft.functions.GraftFunctions.word_shingles(col("text"), 5)).as("sg"))
      .distinct().count()
    val gate = n - 1
    assert(gate < n && n <= gate * Decontaminate.HashBudgetFactor)
    val plan = Decontaminate.reportHashPrefiltered(corpus, bench, "doc_id",
      "text", w = 5, minShared = 1, maxBroadcast = gate)
      .queryExecution.executedPlan.toString
    // the scan-side semi-join against the hash set is broadcast
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftSemi"), s"hash semi-join not broadcast:\n$plan")
  }

  test("cleanManaged drops flagged docs; the plan survives its cleanup") {
    val corpus = docs.filter(col("doc_id") % 11 =!= 0)
    val bench = docs.filter(col("doc_id") % 11 === 0)
    val (cleaned, cleanup) = Decontaminate.cleanManaged(corpus, bench,
      "doc_id", "text", w = 5, minShared = 1)
    val expect = corpus.count() - Decontaminate.report(corpus, bench,
      "doc_id", "text", w = 5, minShared = 1).count()
    assert(cleaned.count() == expect)
    cleanup() // releases the benchmark-shingle cache...
    // ...after which the plan still evaluates (recomputes the subtree)
    assert(cleaned.count() == expect)
  }

  // ------------------------------------------------------ LM perplexity

  test("unigram perplexity: known corpus, closed-form check") {
    // corpus: "a a a b" + "a b c" -> counts a=4, b=2, c=1, N=7
    // vocab (minCount=2): {a, b}; c is OOV (alpha=0.5)
    val df = Seq((1L, "a a a b"), (2L, "a b c")).toDF("doc_id", "text")
    val out = LanguageModel.perplexity(df, "doc_id", "text",
      minCount = 2, oovAlpha = 0.5)
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    def nll(p: Double) = -math.log(p)
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    val d1 = (3 * nll(4.0 / 7) + nll(2.0 / 7)) / 4
    val d2 = (nll(4.0 / 7) + nll(2.0 / 7) + nll(0.5 / 7)) / 3
    assert(out.map(t => (t._1, t._2)) == Seq((1L, 4L), (2L, 3L)))
    assert(math.abs(out(0)._3 - r4(d1)) < 2e-4, s"${out(0)._3} vs $d1")
    assert(math.abs(out(1)._3 - r4(d2)) < 2e-4, s"${out(1)._3} vs $d2")
    // OOV makes doc 2 strictly more perplexing
    assert(out(1)._4 > out(0)._4)
  }

  test("unigram perplexity is partitioning-invariant (decimal sums)") {
    val a = LanguageModel.perplexity(docs, "doc_id", "text")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    val b = LanguageModel.perplexity(docs.repartition(13), "doc_id", "text")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(a == b, "decimal-summed nll must be bit-stable under partitioning")
    assert(a.nonEmpty && a.forall(_._4 > 0))
  }

  test("perplexityManaged cleanup releases the counts cache; plan survives") {
    val (out, cleanup) = LanguageModel.perplexityManaged(docs, "doc_id", "text")
    val n = out.count()
    cleanup()
    assert(out.count() == n)
  }

  test("pplBucketsManaged: same buckets as pplBuckets; cleanup survives") {
    val langd = docs.withColumn("lang",
      when(col("doc_id") % 2 === 0, "en").otherwise("de"))
    val plain = LanguageModel.pplBuckets(langd, "doc_id", "text", "lang")
      .as[(Long, String, Double, String)].collect().sortBy(_._1).toSeq
    val (out, cleanup) =
      LanguageModel.pplBucketsManaged(langd, "doc_id", "text", "lang")
    val managed = out.as[(Long, String, Double, String)]
      .collect().sortBy(_._1).toSeq
    cleanup()
    assert(managed == plain)
    assert(out.count() == plain.length.toLong, "plan survives cleanup")
  }

  test("bigram stupid-backoff perplexity: known corpus, closed-form check") {
    // corpus: "a b a b" + "a b x" -> c1: a=3 b=3 x=1, N=7; attested
    // bigrams (c2 >= 2): only (a,b) with c2=3, c1(a)=3 -> p(b|a)=1;
    // (b,a) and (b,x) fall back to 0.4 * unigram; x is OOV (0.5)
    val df = Seq((1L, "a b a b"), (2L, "a b x")).toDF("doc_id", "text")
    val out = LanguageModel.bigramPerplexity(df, "doc_id", "text",
      minCount = 2, oovAlpha = 0.5)
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    def nll(p: Double) = -math.log(p)
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    val d1 = (nll(3.0 / 7) + 0.0 + nll(0.4 * 3.0 / 7) + 0.0) / 4
    val d2 = (nll(3.0 / 7) + 0.0 + nll(0.4 * 0.5 / 7)) / 3
    assert(out.map(t => (t._1, t._2)) == Seq((1L, 4L), (2L, 3L)))
    assert(math.abs(out(0)._3 - r4(d1)) < 2e-4, s"${out(0)._3} vs $d1")
    assert(math.abs(out(1)._3 - r4(d2)) < 2e-4, s"${out(1)._3} vs $d2")
    // the doc whose bigrams repeat scores less perplexing than the OOV doc
    assert(out(0)._4 < out(1)._4)
  }

  test("bigram perplexity is partitioning-invariant and context-aware " +
       "beyond the unigram model") {
    val a = LanguageModel.bigramPerplexity(docs, "doc_id", "text")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    val b = LanguageModel.bigramPerplexity(docs.repartition(13), "doc_id", "text")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(a == b, "decimal-summed nll must be bit-stable under partitioning")
    // same token totals as the unigram scorer, different model
    val uni = LanguageModel.perplexity(docs, "doc_id", "text")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(a.map(t => (t._1, t._2)) == uni.map(t => (t._1, t._2)))
    assert(a.exists { case (id, _, nllB, _) =>
      uni.find(_._1 == id).exists(_._3 != nllB) })
  }

  test("KN trigram: closed-form check on a tiny corpus; backoff chain " +
       "reaches every level") {
    // corpus: "a b c a b c" + "a b d" — trigram (a,b,c) repeats, (a,b,d)
    // is attested once, "x y" exercises the bigram/unigram-only levels
    val df = Seq((1L, "a b c a b c"), (2L, "a b d"), (3L, "x y"))
      .toDF("doc_id", "text")
    val out = LanguageModel.trigramKnPerplexity(df, "doc_id", "text")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(out.map(t => (t._1, t._2)) == Seq((1L, 6L), (2L, 3L), (3L, 2L)))
    // driver replay of the exact formula for doc 2's third token (d):
    // context (a,b): c3(a,b,d)=1, c(ab·)=3, N1+(ab·)=2
    // level 2: v=b, N1+(·bd)=1, N1+(·b·)=2 (types (a,b)->c, (a,b)->d...
    //   contvw over t3: (b,c)->N1+=1 [only u=a], (b,d)->1, (c,a)->1,
    //   (b,a)? t3 trigrams: (a,b,c) x2, (b,c,a), (c,a,b), (a,b,d) ->
    //   v=b: (b,c) and (b,d) -> n1vdot=2, T(b)=2
    // level 1: b2 types: (a,b),(b,c),(c,a),(b,d),(x,y) -> N1+(··)=5;
    //   N1+(·d)=1
    val d = 0.75
    val pUniD = 1.0 / 5
    val pBiD = math.max(1 - d, 0) / 2 + d * 2 / 2 * pUniD
    val pTriD = math.max(1 - d, 0) / 3 + d * 2 / 3 * pBiD
    // doc 2 = [a (uni), b (bi), d (tri)]
    // pUni(a): N1+(·a)=1 -> 1/5; pBi(b|a): N1+(·ab)=1? t3 (c,a,b) -> yes
    //   v=a: contvw (a,b)->1 -> n1vdot=1, T(a)=1; pBi = (1-.75)/1 + .75*1/1*pUni(b)
    //   N1+(·b)=1 -> pUni(b)=1/5
    val pUniA = 1.0 / 5
    val pBiB = math.max(1 - d, 0) / 1 + d * 1 / 1 * (1.0 / 5)
    val exp2 = -(math.log(pUniA) + math.log(pBiB) + math.log(pTriD)) / 3
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    assert(math.abs(out(1)._3 - r4(exp2)) < 2e-4, s"${out(1)._3} vs $exp2")
    // doc 3: x (uni, N1+(·x)=0 -> OOV 0.5/5), y (bi; v=x not a trigram
    // middle -> pUni(y)=1/5)
    val exp3 = -(math.log(0.5 / 5) + math.log(1.0 / 5)) / 2
    assert(math.abs(out(2)._3 - r4(exp3)) < 2e-4, s"${out(2)._3} vs $exp3")
  }

  test("KN trigram: every backoff level normalizes to exactly 1 over the " +
       "vocabulary; partitioning-invariant") {
    // normalization: for any attested context, sum_w p(w|context) over
    // the full vocab = 1 (the discount mass re-enters via lambda)
    val rnd = new scala.util.Random(5)
    val words = Vector("a", "b", "c", "d", "e")
    val df = (1L to 30L).map(i =>
      (i, (1 to 40).map(_ => words(rnd.nextInt(words.size))).mkString(" ")))
      .toDF("doc_id", "text")
    // score a probe doc per candidate w under a FIXED context (u,v) by
    // scoring synthetic 3-token docs "u v w" and extracting p_tri
    val probes = ((for (w <- words) yield
        (1000L + words.indexOf(w), s"a b $w")) :+ (2000L -> "a b"))
      .toDF("doc_id", "text")
    // ONE model over df + all probes: avg_nll of "a b w" =
    // (nll(pUni(a)) + nll(pBi(b|a)) + nll(pTri(w|a,b)))/3 and the "a b"
    // probe isolates the shared two-term prefix, so
    // sum_w exp(-(3*avg_w - 2*avg_ab)) = sum_w pTri(w|a,b) = 1
    // (4dp-rounded inputs -> 1e-2 tolerance)
    val all = LanguageModel.trigramKnPerplexity(
      df.unionByName(probes), "doc_id", "text")
      .filter(col("doc_id") >= 1000L)
      .as[(Long, Long, Double, Double)].collect()
    val shared = all.find(_._1 == 2000L).get._3 * 2
    val sum = all.filter(_._1 < 2000L)
      .map(t => math.exp(-(t._3 * 3 - shared))).sum
    assert(math.abs(sum - 1.0) < 1e-2,
      s"p(w|a,b) must sum to 1 over the vocab, got $sum")
    val a = LanguageModel.trigramKnPerplexity(df, "doc_id", "text")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    val b = LanguageModel.trigramKnPerplexity(df.repartition(7), "doc_id", "text")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(a == b, "decimal-summed nll must be bit-stable under partitioning")
  }

  // ------------------------------------------------------ repetition stats

  test("repetition_stats matches a brute-force reference on edge cases") {
    val fixture = Seq(
      (1L, ""),                       // 1 empty token after split
      (2L, "solo"),                   // single token
      (3L, "a a a a"),                // max repetition
      (4L, "a b a b a"),              // repeated 2-grams, distinct 3-grams wrap
      (5L, "w x y z"),                // all distinct
      (6L, "a b c a b c a b c"),      // period-3 repetition
      (7L, "x"),                      // no 2-grams
      (8L, "x y")                     // one 2-gram, no 3-grams
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetition(fixture, "doc_id", "text")
      .as[(Long, Long, Double, Double, Double, Double)]
      .collect().sortBy(_._1).toSeq
    def ref(text: String): (Long, Double, Double, Double, Double) = {
      val t = text.split(" ", -1).toSeq
      val n = t.size
      def grams(w: Int) = if (n < w) Seq.empty
        else (0 to n - w).map(i => t.slice(i, i + w).mkString(" "))
      def dup(a: Seq[String]) =
        if (a.isEmpty) 0.0 else (a.size - a.distinct.size).toDouble / a.size
      val top = if (n == 0) 0.0
        else t.groupBy(identity).values.map(_.size).max.toDouble / n
      (n.toLong, dup(t), dup(grams(2)), dup(grams(3)), top)
    }
    fixture.as[(Long, String)].collect().sortBy(_._1).zip(got).foreach {
      case ((id, text), (gid, n, d1, d2, d3, tp)) =>
        val (rn, r1, r2, r3, rt) = ref(Option(text).getOrElse(""))
        assert(gid == id && n == rn && d1 == r1 && d2 == r2 && d3 == r3 &&
          tp == rt, s"doc $id: got ($n,$d1,$d2,$d3,$tp) want ($rn,$r1,$r2,$r3,$rt)")
    }
  }

  test("repetition_stats agrees with the oracle-green query on real docs") {
    // the native single-pass Expression vs an independent builtin
    // composition (the pre-rewrite formulation) over the corpus fixture
    val toks = split(coalesce(col("text"), lit("")), " ")
    def grams(w: Int) = when(size(toks) < w, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - (w - 1)),
        i => concat_ws(" ", slice(toks, i, lit(w)))))
    def dupFrac(a: org.apache.spark.sql.Column) =
      when(size(a) === 0, lit(0.0))
        .otherwise((size(a) - size(array_distinct(a))).cast("double") / size(a))
    val sub = docs.filter(col("doc_id") < 120)
    val reference = sub.select(col("doc_id"),
      dupFrac(toks).as("r1"), dupFrac(grams(2)).as("r2"),
      dupFrac(grams(3)).as("r3"))
    val native = TextAnalysis.repetition(sub, "doc_id", "text")
    val joined = native.join(reference, "doc_id")
    assert(joined.count() > 100)
    assert(joined.filter(col("dup_token_frac") =!= col("r1") ||
      col("dup_2gram_frac") =!= col("r2") ||
      col("dup_3gram_frac") =!= col("r3")).count() == 0)
  }

  // ------------------------------------------- temperature mixture sampling

  test("temperature sampling keeps the largest stratum whole, downsamples " +
    "the rest at sqrt(n/nmax)") {
    // strata of 6400 / 1600 / 400 rows: rates 1.0 / 0.5 / 0.25
    val df = ((1 to 6400).map(i => (i.toLong, "big")) ++
      (1 to 1600).map(i => (10000L + i, "mid")) ++
      (1 to 400).map(i => (20000L + i, "small"))).toDF("id", "src")
    val out = Sampling.temperature(df, "id", "src")
    val byStratum = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStratum("big") == 6400L, "largest stratum must be keep-all")
    assert(math.abs(byStratum("mid") / 1600.0 - 0.5) < 0.08,
      s"mid rate ${byStratum("mid") / 1600.0}, wanted ~0.5")
    assert(math.abs(byStratum("small") / 400.0 - 0.25) < 0.12,
      s"small rate ${byStratum("small") / 400.0}, wanted ~0.25")
  }

  test("temperature sampling is deterministic and partitioning-invariant") {
    val a = Sampling.temperature(docs, "doc_id", "source")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b = Sampling.temperature(docs.repartition(17), "doc_id", "source")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("temperature sampling with one stratum keeps everything") {
    val df = (1 to 100).map(i => (i.toLong, "only")).toDF("id", "src")
    assert(Sampling.temperature(df, "id", "src").count() == 100)
  }

  // ------------------------------------------------------- split assignment

  test("split is a disjoint, exhaustive, partitioning-invariant partition") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = Sampling.split(docs, "doc_id", splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val b = Sampling.split(docs.repartition(13), "doc_id", splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(a == b, "assignment must not depend on partitioning")
    assert(a.size == docs.count(), "every row gets exactly one label")
    val byLabel = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(byLabel.keySet == Set("train", "val", "test"))
    assert(byLabel("train") > byLabel("val") && byLabel("train") > byLabel("test"))
    // fractions land near targets
    assert(math.abs(byLabel("train").toDouble / a.size - 0.8) < 0.1)
  }

  test("split rejects fractions that don't sum to 1") {
    intercept[IllegalArgumentException] {
      Sampling.split(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.3))
    }
  }
}
