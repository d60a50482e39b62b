package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** URL canonicalization and per-domain curation — the first stages of a
  * web-crawl pipeline (CCNet / RefinedWeb style): the same page is crawled
  * under many syntactic spellings of one URL, so exact-URL dedup only works
  * after canonicalization, and per-domain quotas stop any single host from
  * dominating the mixture.
  *
  * Canonical form (each step replayed verbatim by the DuckDB oracle):
  *   1. scheme and host lowercased; http upgraded to https (scheme
  *      normalization — crawl dedup treats the protocol move as the same
  *      resource)
  *   2. leading "www." stripped from the host
  *   3. default ports ":80"/":443" stripped
  *   4. path: "//" collapsed to "/", trailing "/" stripped (root stays "")
  *   5. fragment dropped
  *   6. query: tracking params removed (utm_*, fbclid, gclid, ref),
  *      survivors sorted lexicographically by the full "k=v" pair and
  *      rejoined; an emptied query drops its "?"
  *   7. scheme-less / host-less (malformed) URLs pass through UNCHANGED
  *      so they never merge into one dedup group (advisor r12)
  *
  * Scale shape: canonicalization is a pure scan-side projection (regexp +
  * array ops, no shuffle). URL dedup is one hash groupBy on the canonical
  * string; the domain cap is one shuffle on host with a bounded per-host
  * row_number (cap << host size, so AQE skew-split handles hot hosts).
  */
object UrlCuration {

  /** Query-param names dropped as tracking noise (utm_* is a prefix). */
  val TrackingParams: Seq[String] = Seq("fbclid", "gclid", "ref")

  /** Deterministic messy-URL synthesis for the corpus: six spellings of
    * the resource keyed (host = doc_id mod 13, path = doc_id mod 5,
    * id param = doc_id mod 3), chosen so each variant exercises one
    * canonicalization rule and all six collapse to the SAME canonical URL
    * — dup groups are the (host, path, id) CRT classes (modulus 195, so
    * any corpus past ~200 docs genuinely collides). Replayed verbatim by
    * the oracle; the canonicalizer is what's tested. */
  def withSyntheticUrls(docs: DataFrame, idCol: String): DataFrame = {
    val id = col(idCol)
    val h = pmod(id, lit(13)).cast("string")
    val p = pmod(id, lit(5)).cast("string")
    val q = pmod(id, lit(3)).cast("string")
    val v = pmod(id, lit(6))
    val url = when(v === 0,
        concat(lit("https://SITE"), h, lit(".Example.COM/p"), p,
          lit("/doc?id="), q, lit("&utm_source=feed#sec")))
      .when(v === 1,
        concat(lit("http://www.site"), h, lit(".example.com:80/p"), p,
          lit("/doc?id="), q, lit("&utm_campaign=x")))
      .when(v === 2,
        concat(lit("https://site"), h, lit(".example.com:443/p"), p,
          lit("/doc/?id="), q))
      .when(v === 3,
        concat(lit("https://site"), h, lit(".example.com/p"), p,
          lit("/doc?ref=tw&id="), q))
      .when(v === 4,
        concat(lit("http://site"), h, lit(".example.com/p"), p,
          lit("//doc?gclid=g1&id="), q))
      .otherwise(
        concat(lit("https://site"), h, lit(".example.com/p"), p,
          lit("/doc?id="), q))
    docs.withColumn("url", url)
  }

  /** Canonical host: lowercased authority minus "www." and default port. */
  def hostCol(url: Column): Column = {
    val auth = lower(regexp_extract(url, "^[a-zA-Z]+://([^/?#]+)", 1))
    regexp_replace(regexp_replace(auth, ":(80|443)$", ""), "^www\\.", "")
  }

  /** Canonical URL per the rule list above. */
  def canonicalCol(url: Column): Column = {
    val rawPath = regexp_extract(url, "^[a-zA-Z]+://[^/?#]+([^?#]*)", 1)
    val path = regexp_replace(
      regexp_replace(rawPath, "//+", "/"), "/$", "")
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    val pairs = filter(split(query, "&"), kv => {
      val k = split(kv, "=").getItem(0)
      !(k.startsWith("utm_") ||
        TrackingParams.foldLeft(lit(false))((acc, t) => acc || k === t))
    })
    val qs = array_join(array_sort(pairs), "&")
    val canon = concat(lit("https://"), hostCol(url), path,
      when(length(qs) > 0, concat(lit("?"), qs)).otherwise(lit("")))
    // scheme-less / authority-less URLs pass through UNCHANGED (advisor
    // r12: '' host would collapse every malformed URL into one
    // 'https://' dedup group — identity keeps them distinct)
    when(length(hostCol(url)) > 0, canon).otherwise(url)
  }

  /** Per-row canonicalization readout: (id, url, canon_url, host). */
  def canonicalize(docs: DataFrame, idCol: String, urlCol: String): DataFrame =
    docs.select(col(idCol), col(urlCol),
      canonicalCol(col(urlCol)).as("canon_url"),
      hostCol(col(urlCol)).as("host"))

  /** Exact dedup on the canonical URL: one hash groupBy, keeps the
    * smallest id per group (first-crawled wins). */
  def dedupByUrl(docs: DataFrame, idCol: String, urlCol: String): DataFrame =
    docs.select(col(idCol), canonicalCol(col(urlCol)).as("canon_url"))
      .groupBy(col("canon_url"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** End-to-end crawl-curation funnel, per source: the composed
    * blocklist -> canonical-URL dedup -> C4 line filter pipeline with a
    * stage-by-stage survivor count — the acceptance readout a crawl
    * ingestion run publishes (docs in, blocked, unique-after-dedup,
    * C4-kept, kept tokens). Stage semantics:
    *   blocked  = canonical host in `blockedHosts`
    *   winner   = smallest doc_id of the canon group among NOT-blocked
    *   pass     = winner that survives the C4 rules
    * One shuffle on the canonical url (the window min) + one partial-agg
    * groupBy on source; every per-doc flag is scan-side. */
  def crawlFunnel(docs: DataFrame, idCol: String, urlCol: String,
                  textCol: String, srcCol: String,
                  blockedHosts: Seq[String], minWords: Int = 5,
                  minKeptLines: Int = 3): DataFrame = {
    val host = hostCol(col(urlCol))
    val blocked = blockedHosts.foldLeft(lit(false))((a, h) => a || host === h)
    val winId = min(when(!col("blocked"), col(idCol)))
      .over(Window.partitionBy(col("canon_url")))
    val kept = C4Filter.keptLinesCol(col(textCol), minWords)
    val keptTokens = aggregate(col("kept_lines"), lit(0),
      (acc, l) => acc + size(split(l, " ")))
    docs
      .withColumn("canon_url", canonicalCol(col(urlCol)))
      .withColumn("blocked", blocked)
      .withColumn("winner", !col("blocked") && col(idCol) === winId)
      .withColumn("kept_lines", kept)
      .withColumn("pass", col("winner") &&
        !C4Filter.braceCol(col(textCol)) &&
        size(col("kept_lines")) >= minKeptLines)
      .groupBy(col(srcCol))
      .agg(count(lit(1)).as("docs_in"),
        sum(col("blocked").cast("int")).as("n_blocked"),
        sum(col("winner").cast("int")).as("n_unique"),
        sum(col("pass").cast("int")).as("n_kept"),
        sum(when(col("pass"), keptTokens).otherwise(0)).as("tokens_kept"))
  }

  /** Incremental canonical-URL admission — the URL member of the
    * bipartite incremental-dedup family (MinHash and SRP-embedding
    * twins live in Dedup): a NEW crawl batch admits only documents
    * whose canonical URL (a) is absent from the existing corpus (LEFT
    * ANTI on the canonical string — the corpus never re-shuffles its
    * text, only its canon strings) and (b) is the batch's own
    * first-crawled spelling (min id per canon within the batch). */
  def dedupUrlIncremental(batch: DataFrame, corpus: DataFrame,
                          idCol: String, urlCol: String): DataFrame = {
    val canon = canonicalCol(col(urlCol))
    val known = corpus.select(canon.as("canon_url")).distinct()
    batch.select(col(idCol), canon.as("canon_url"))
      .join(known, Seq("canon_url"), "left_anti")
      .groupBy(col("canon_url"))
      .agg(min(col(idCol)).as("admit_id"),
        count(lit(1)).as("n_spellings"))
  }

  /** Cross-split leakage report: canonical URLs whose duplicate crawls
    * landed in MORE THAN ONE train/val/test split — the URL-level twin of
    * benchmark decontamination (a page split-assigned by doc_id leaks
    * whenever two spellings of it drew different ids). One groupBy on the
    * canonical string; collect_set is bounded by the split count (3), so
    * the agg combines map-side like any counter. */
  def splitLeakage(docs: DataFrame, idCol: String, urlCol: String,
                   splitCol: String): DataFrame =
    docs.select(canonicalCol(col(urlCol)).as("canon_url"), col(splitCol))
      .groupBy(col("canon_url"))
      .agg(count(lit(1)).as("n_docs"),
        size(collect_set(col(splitCol))).as("n_splits"),
        array_join(array_sort(collect_set(col(splitCol))), ",").as("splits"))
      .where(col("n_splits") > 1)

  /** Per-domain quota: keep at most `cap` documents per canonical host,
    * best-first by (sizeCol DESC, id ASC). RefinedWeb-style host balance.
    *
    * Hot hosts are the NORM here (domains are few and skewed), and a
    * row_number window cannot AQE-skew-split (a host's global rank needs
    * all its rows together), so this runs the salted two-phase prune:
    * phase 1 ranks within (host, id mod `salts`) — `salts` balanced
    * partitions per hot host — and keeps `cap` per salt; any row in the
    * host's global top-cap is in its salt bucket's top-cap, so phase 2's
    * window ranks <= salts*cap rows per host and emits the bit-identical
    * result the single-window plan would. Shuffles carry only
    * (host, size, id). */
  def domainCap(docs: DataFrame, idCol: String, urlCol: String,
                sizeCol: String, cap: Int = 3, salts: Int = 32): DataFrame = {
    val ord: Seq[Column] = Seq(col(sizeCol).desc, col(idCol))
    val w1 = Window.partitionBy(col("host"), pmod(col(idCol), lit(salts)))
      .orderBy(ord: _*)
    val w2 = Window.partitionBy(col("host")).orderBy(ord: _*)
    docs.select(col(idCol), col(sizeCol), hostCol(col(urlCol)).as("host"))
      .withColumn("srk", row_number().over(w1))
      .where(col("srk") <= cap)
      .withColumn("rk", row_number().over(w2))
      .where(col("rk") <= cap)
      .select(col(idCol), col("host"), col("rk"))
  }
}
