package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C4 line filtering, URL canonicalization/curation, SFT template
  * rendering, and the quality-threshold sweep. */
class WebCurationSpec extends SparkSpec {
  import spark.implicits._

  // ---- C4 line filter ----------------------------------------------------

  private def docsDf = Seq(
    // 3+ keepable lines (>= 5 words each, terminal punct via mark 3/4)
    (12L, Seq.fill(8)("alpha beta gamma delta epsilon zeta eta theta").mkString(" ")),
    // short doc: lines exist but < 3 survive
    (1L, "one two three"),
    // brace doc: doc_id % 13 == 7 -> appended "(function() {" drops it
    (7L, Seq.fill(8)("alpha beta gamma delta epsilon zeta eta theta").mkString(" "))
  ).toDF("doc_id", "text")

  test("c4 filter keeps only terminal-punct, long, policy-clean lines") {
    val decorated = C4Filter.withSyntheticLines(docsDf, "doc_id", "text")
    val out = C4Filter.filterDocs(decorated, "doc_id", "text").collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(!byId.contains(7L), "curly-brace doc must be dropped whole")
    assert(!byId.contains(1L), "doc with < 3 kept lines must be dropped")
    assert(byId.contains(12L))
    val r = byId(12L)
    val kept = r.getString(3).split("\n")
    assert(kept.forall(l => l.endsWith(".") || l.endsWith("!") ||
      l.endsWith("?") || l.endsWith("\"")))
    assert(kept.forall(_.split(" ").length >= 5))
    assert(kept.forall(l => !l.toLowerCase.contains("javascript") &&
      !l.toLowerCase.contains("lorem ipsum") && !l.toLowerCase.contains("cookie")))
    assert(r.getInt(2) === kept.length)
  }

  test("a closing-brace-only doc drops too (advisor r12: C4 rule is any brace)") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta. end } marker here now ok."),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa fine.")
    ).toDF("doc_id", "text")
    assert(df.filter(C4Filter.braceCol(col("text")))
      .select("doc_id").as[Long].collect().toSeq === Seq(1L))
  }

  test("c4 report retention matches the per-doc filter") {
    val decorated = C4Filter.withSyntheticLines(
      docsDf.withColumn("source", lit("s")), "doc_id", "text")
    val rep = C4Filter.report(decorated, "doc_id", "text", "source").collect()
    assert(rep.length === 1)
    assert(rep.head.getAs[Long]("docs_in") === 3L)
    assert(rep.head.getAs[Long]("docs_kept") === 1L)
    assert(rep.head.getAs[Long]("docs_braced") === 1L)
  }

  // ---- URL canonicalization ----------------------------------------------

  test("all six messy spellings collapse to one canonical URL") {
    // ids 0..5 share (id%13, id%5, id%3) only by accident; instead verify
    // via direct spellings of ONE resource
    val urls = Seq(
      "https://SITE1.Example.COM/p2/doc?id=0&utm_source=feed#sec",
      "http://www.site1.example.com:80/p2/doc?id=0&utm_campaign=x",
      "https://site1.example.com:443/p2/doc/?id=0",
      "https://site1.example.com/p2/doc?ref=tw&id=0",
      "http://site1.example.com/p2//doc?gclid=g1&id=0",
      "https://site1.example.com/p2/doc?id=0"
    ).zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("doc_id", "url")
    val canon = urls.select(UrlCuration.canonicalCol(col("url"))).distinct().collect()
    assert(canon.length === 1)
    assert(canon.head.getString(0) === "https://site1.example.com/p2/doc?id=0")
  }

  test("malformed URLs pass through unchanged and never merge (advisor r12)") {
    val df = Seq(
      (0L, "not a url at all"),
      (1L, "relative/path?id=3"),
      (2L, "mailto:someone"),
      (3L, "https://ok.example.com/a/")).toDF("doc_id", "url")
    val got = df.select(col("doc_id"),
        UrlCuration.canonicalCol(col("url")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(0L) === "not a url at all")
    assert(got(1L) === "relative/path?id=3")
    assert(got(2L) === "mailto:someone")
    assert(got(3L) === "https://ok.example.com/a")
    assert(got.values.toSet.size === 4, "no conflation into one group")
  }

  test("canonicalization sorts surviving params and keeps non-tracking ones") {
    val df = Seq((0L, "https://h.example.com/a?z=9&a=1&utm_x=t&fbclid=f&b=2"))
      .toDF("doc_id", "url")
    val c = df.select(UrlCuration.canonicalCol(col("url"))).head().getString(0)
    assert(c === "https://h.example.com/a?a=1&b=2&z=9")
  }

  test("salted domain cap equals the single-window reference plan") {
    // adversarial shape: one very hot host, ties in size broken by id
    val df = (0L to 499L).map { i =>
      val host = if (i % 10 < 8) "hot" else s"cold${i % 3}"
      (i, s"https://$host.example.com/d$i", (i % 7).toInt)
    }.toDF("doc_id", "url", "sz")
    val salted = UrlCuration.domainCap(df, "doc_id", "url", "sz", cap = 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("host")).orderBy(col("sz").desc, col("doc_id"))
    val reference = df
      .select(col("doc_id"), col("sz"), UrlCuration.hostCol(col("url")).as("host"))
      .withColumn("rk", row_number().over(w)).where(col("rk") <= 5)
      .select(col("doc_id"), col("host"), col("rk"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(salted === reference)
  }

  test("canonicalization is idempotent over the synthetic spelling space") {
    val docs = (0L to 500L).toDF("doc_id")
    val once = UrlCuration.withSyntheticUrls(docs, "doc_id")
      .select(UrlCuration.canonicalCol(col("url")).as("c1"))
    val twice = once.select(col("c1"),
      UrlCuration.canonicalCol(col("c1")).as("c2"))
    assert(twice.where(col("c1") =!= col("c2")).count() === 0L,
      "canon(canon(u)) must equal canon(u)")
  }

  test("domain cap keeps at most cap docs per host, best-first") {
    val df = (0L to 19L).map(i =>
      (i, s"https://h${i % 2}.example.com/d$i", 100 - i.toInt)).toDF("doc_id", "url", "sz")
    val out = UrlCuration.domainCap(df, "doc_id", "url", "sz", cap = 3).collect()
    assert(out.length === 6)
    // best-first: host h0 gets ids 0,2,4 (largest sz)
    val h0 = out.filter(_.getString(1) == "h0.example.com").map(_.getLong(0)).sorted
    assert(h0.toSeq === Seq(0L, 2L, 4L))
  }

  test("incremental url admission drops known canons, admits first spelling") {
    val corpus = Seq((1L, "https://a.example.com/x")).toDF("doc_id", "url")
    val batch = Seq(
      (10L, "https://A.example.com/x?utm_source=z"), // respelled known -> drop
      (12L, "http://www.b.example.com:80/y"),        // new canon, two spellings
      (11L, "https://b.example.com/y"),
      (13L, "https://c.example.com/z")).toDF("doc_id", "url")
    val out = UrlCuration.dedupUrlIncremental(batch, corpus, "doc_id", "url")
      .orderBy("canon_url").collect()
    assert(out.map(_.getString(0)).toSeq ===
      Seq("https://b.example.com/y", "https://c.example.com/z"))
    assert(out(0).getAs[Long]("admit_id") === 11L)
    assert(out(0).getAs[Long]("n_spellings") === 2L)
  }

  test("split leakage reports only canonical groups spanning splits") {
    val df = Seq(
      (0L, "https://a.example.com/x", "train"),
      (1L, "https://A.example.com/x", "test"),    // same canon, other split
      (2L, "https://b.example.com/y", "train"),
      (3L, "https://b.example.com/y", "train")    // dup but same split
    ).toDF("doc_id", "url", "split")
    val out = UrlCuration.splitLeakage(df, "doc_id", "url", "split").collect()
    assert(out.length === 1)
    assert(out.head.getString(0) === "https://a.example.com/x")
    assert(out.head.getAs[Long]("n_docs") === 2L)
    assert(out.head.getAs[String]("splits") === "test,train")
  }

  // ---- SFT render + masks -------------------------------------------------

  test("mask spans address exactly the assistant contents of the render") {
    val ev = graft.tables.Tables.events(spark, sf("sf0.001"))
    val masks = SftRender.maskSpans(ev)
      .where(col("user_id") === 1L).orderBy("turn_idx").collect()
    assert(masks.nonEmpty)
    // reconstruct the rendered string for user 1 independently
    val turns = ev.where(col("user_id") === 1L)
      .orderBy(col("ts"), col("event_id"))
      .select(concat(col("event_type"), lit(" "),
        pmod(col("event_id"), lit(1000)).cast("string")).as("c"))
      .collect().map(_.getString(0))
    val rendered = turns.zipWithIndex.map { case (c, i) =>
      (if (i % 2 == 0) "<|user|>\n" else "<|assistant|>\n") + c + "\n"
    }.mkString
    masks.foreach { m =>
      val (ti, s, e) = (m.getInt(1), m.getLong(2).toInt, m.getLong(3).toInt)
      assert(ti % 2 === 1)
      assert(rendered.substring(s, e) === turns(ti), s"span of turn $ti")
    }
    // and the render query's md5 certifies the same string
    val md5Row = SftRender.render(ev).where(col("user_id") === 1L).head()
    assert(md5Row.getAs[String]("rendered_md5") ===
      org.apache.commons.codec.digest.DigestUtils.md5Hex(rendered))
    assert(md5Row.getAs[Int]("n_chars_r") === rendered.length)
  }

  // ---- length-bucketed batch plan ------------------------------------------

  test("length buckets are the smallest pow2 >= token count, floored at 16") {
    val df = Seq(
      (0L, Seq.fill(3)("w").mkString(" ")),    // 3 tokens  -> 16
      (1L, Seq.fill(16)("w").mkString(" ")),   // 16        -> 16 (exact pow2)
      (2L, Seq.fill(17)("w").mkString(" ")),   // 17        -> 32
      (3L, Seq.fill(100)("w").mkString(" "))   // 100       -> 128
    ).toDF("doc_id", "text")
    val out = Packing.lengthBuckets(df, "doc_id", "text", tokenBudget = 64)
      .orderBy("bucket").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(16L, 32L, 128L))
    val b16 = out(0)
    assert(b16.getAs[Long]("n_docs") === 2L)
    assert(b16.getAs[Long]("tokens") === 19L)
    assert(b16.getAs[Long]("pad_tokens") === (16 - 3) + (16 - 16))
    assert(b16.getAs[Long]("batch_size") === 4L)   // 64 / 16
    assert(b16.getAs[Long]("n_batches") === 1L)
    // bucket past the budget still batches one-at-a-time
    val b128 = out(2)
    assert(b128.getAs[Long]("batch_size") === 1L)
    assert(b128.getAs[Long]("n_batches") === 1L)
  }

  // ---- vocab report ---------------------------------------------------------

  test("vocab report counters are exact on a hand-checkable fixture") {
    val df = Seq(
      ("s", "a a a b b c"),           // vocab {a:3,b:2,c:1}
      ("s", "a d"),                   // a:4, d:1
      ("t", "x y")                    // all hapax
    ).toDF("source", "text")
    val out = TextAnalysis.vocabReport(df, "source", "text", topK = 2)
      .orderBy("source").collect()
    val s = out(0)
    assert(s.getAs[Long]("vocab_size") === 4L)      // a b c d
    assert(s.getAs[Long]("total_tokens") === 8L)
    assert(s.getAs[Double]("hapax_frac") === 0.5)   // c, d of 4 types
    assert(s.getAs[Double]("top100_mass") === 0.75) // top2 = a(4)+b(2) of 8
    val t = out(1)
    assert(t.getAs[Double]("hapax_frac") === 1.0)
    assert(t.getAs[Double]("top100_mass") === 1.0)
  }

  // ---- crawl funnel ---------------------------------------------------------

  test("crawl funnel stages are monotone and blocked hosts never win") {
    val docs = graft.tables.Tables.documents(spark, sf("sf0.001"))
    val blocked = Seq(0, 5, 10).map(i => s"site$i.example.com")
    val base = UrlCuration.withSyntheticUrls(
      C4Filter.withSyntheticLines(docs, "doc_id", "text"), "doc_id")
    val out = UrlCuration.crawlFunnel(base, "doc_id", "url", "text",
      "source", blocked).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (in, nb, nu, nk) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nb + nu <= in, s"blocked+unique can't exceed docs_in: $r")
      assert(nk <= nu, s"C4-kept can't exceed unique winners: $r")
    }
    // totals: every canon group with a not-blocked member yields ONE winner
    val expectedUnique = base
      .withColumn("host", UrlCuration.hostCol(col("url")))
      .where(!col("host").isin(blocked: _*))
      .select(UrlCuration.canonicalCol(col("url"))).distinct().count()
    assert(out.map(_.getLong(3)).sum === expectedUnique)
  }

  // ---- boilerplate cut ------------------------------------------------------

  test("boilerplate paragraphs cut everywhere, rare ones survive") {
    val banner = "accept our cookie policy"
    val df = (0L to 9L).map { i =>
      val body = s"unique body $i"
      // doc 9 is ALL boilerplate
      (i, if (i == 9L) banner else s"$body\n$banner")
    }.toDF("doc_id", "text")
    val out = Dedup.boilerplateCut(df, "doc_id", "text", maxDf = 5)
      .orderBy("doc_id").collect()
    assert(out.length === 10, "write-back shape: every doc emits")
    out.foreach { r =>
      val (id, kept, clean) = (r.getLong(0), r.getInt(2), r.getString(3))
      if (id == 9L) { assert(kept === 0); assert(clean === "") }
      else { assert(kept === 1); assert(clean === s"unique body $id") }
    }
  }

  // ---- perplexity buckets ---------------------------------------------------

  test("ppl buckets tercile each language and respect the thresholds") {
    val docs = graft.tables.Tables.documents(spark, sf("sf0.001"))
    val out = graft.operators.LanguageModel
      .pplBuckets(docs, "doc_id", "text", "lang").collect()
    assert(out.length === docs.count())
    val byLang = out.groupBy(_.getString(1))
    byLang.foreach { case (lang, rows) =>
      val counts = rows.groupBy(_.getString(3)).view.mapValues(_.length).toMap
      val n = rows.length
      // terciles up to 4dp score ties (ties go to the LOWER bucket, so a
      // run of equal scores at a threshold inflates that bucket): every
      // bucket is non-empty and no bucket exceeds a third plus the
      // largest tie run
      val maxTie = rows.groupBy(_.getDouble(2)).values.map(_.length).max
      Seq("head", "middle", "tail").foreach { b =>
        val c = counts.getOrElse(b, 0)
        assert(c >= 1 && c <= n / 3 + maxTie + 1, s"$lang/$b: $counts")
      }
      // ordering invariant: every head score <= every tail score
      val h = rows.filter(_.getString(3) == "head").map(_.getDouble(2))
      val t = rows.filter(_.getString(3) == "tail").map(_.getDouble(2))
      if (h.nonEmpty && t.nonEmpty) assert(h.max <= t.min)
    }
  }

  // ---- SFT conversation packing ----------------------------------------------

  test("sft pack never overfills a bin and never splits a conversation") {
    val ev = graft.tables.Tables.events(spark, sf("sf0.001"))
    val r = graft.operators.SftRender.render(ev)
    val out = Packing.packBestFitWeighted(
      r.select(col("user_id").as("doc_id"),
        pmod(col("user_id"), lit(4)).as("bucket"),
        col("n_chars_r").cast("long").as("n_tokens")), budget = 1536)
      .collect()
    assert(out.length === r.count(), "every conversation lands exactly once")
    val byBin = out.filter(_.getLong(3) > 0)
      .groupBy(rw => (rw.getLong(1), rw.getLong(3)))
    byBin.foreach { case (bin, rows) =>
      assert(rows.map(_.getLong(2)).sum <= 1536L, s"bin $bin overfull")
    }
    assert(out.exists(_.getLong(3) < 0),
      "fixture must exercise the oversize branch (budget < max conv)")
  }

  // ---- quality sweep -------------------------------------------------------

  test("quality sweep is monotone non-increasing and anchored at 0") {
    val docs = graft.tables.Tables.documents(spark, sf("sf0.001"))
    val rows = TextAnalysis.qualitySweep(docs, "doc_id", "text")
      .orderBy("threshold_pct").collect()
    assert(rows.length === 20)
    assert(rows.head.getAs[Long]("docs_kept") === docs.count())
    val kept = rows.map(_.getAs[Long]("docs_kept"))
    assert(kept.zip(kept.tail).forall { case (a, b) => a >= b })
    val toks = rows.map(_.getAs[Long]("tokens_kept"))
    assert(toks.zip(toks.tail).forall { case (a, b) => a >= b })
  }
}
