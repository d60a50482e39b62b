package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Deduplication family for large-scale training-data pipelines
  * (SURVEY.md §2.2). Scale posture: exact dedup is one hash-groupBy
  * (partial-agg combines map-side); every near-dup variant bounds the
  * candidate set with an equi-joinable signature (LSH band / simhash chunk /
  * shared shingle) so the shuffle carries ids + fixed-width signatures,
  * never O(n²) pairs of full text.
  */
object Dedup {

  /** Exact dedup: group by content hash, keep the minimum id as canonical.
    * One shuffle of (16-byte hash, id); at 100 TB the map-side partial agg
    * already collapses within-partition duplicates. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("h"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact dedup keeping the full surviving rows: ONE shuffle of the rows
    * on the content hash, keep the min-id row per content. Compared to
    * `exact()` + join-back (shuffle (hash,id), then shuffle the full rows
    * again for the join, and execute the upstream plan twice), this is
    * strictly less I/O whenever the caller needs the rows — the shape
    * pipelines like Curation want at 100 TB. */
  def exactRows(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol)))
    docs.withColumn("__keep", min(col(idCol)).over(w))
      .filter(col(idCol) === col("__keep")).drop("__keep")
  }

  /** Exact-Jaccard verification: attach both docs' full shingle sets to
    * each candidate pair, compute |∩| / |∪|, keep pairs ≥ tau. Shared by
    * the MinHash and prefix-filtered n-gram paths so their (oracle-checked)
    * output schema and semantics cannot drift apart. */
  private def verifyJaccard(cand: DataFrame, sh: DataFrame, tau: Double): DataFrame =
    cand
      .join(sh.select(col("doc_id"), col("sh").as("sh_a")), col("doc_a") === col("doc_id"))
      .drop("doc_id")
      .join(sh.select(col("doc_id"), col("sh").as("sh_b")), col("doc_b") === col("doc_id"))
      .drop("doc_id")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("inter") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= tau)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")

  /** Intra-bucket id-ordered candidate pairs: group rows by bucket key,
    * collect the (small) id payloads, emit pairs with a double explode.
    * ONE pass over the upstream pipeline — a self-join would evaluate the
    * (expensive) signature computation once per side. Bucket payloads are
    * bounded by LSH design (a band value collides mostly for true
    * near-dups); a pathological hot bucket surfaces as a big collect_list
    * and should be capped upstream (e.g. `slice`) if the corpus contains
    * massive exact-dup clusters. */
  private def bucketPairs(df: DataFrame, keyCols: Seq[String],
                          payload: Column): DataFrame =
    df.groupBy(keyCols.map(col): _*).agg(collect_list(payload).as("__ids"))
      .filter(size(col("__ids")) > 1)
      .select(explode(col("__ids")).as("__a"), col("__ids"))
      .select(col("__a"), explode(col("__ids")).as("__b"))

  // -------------------------------------------------------------- MinHash

  /** MinHash+LSH near-dup pairs with exact-Jaccard verification.
    * Pipeline: shingle → native `minhash_bands` Expression (128 permuted
    * mins folded to 32 band hashes in one codegen'd loop per row) →
    * band-bucket grouping (only ids + one 8-byte band hash shuffle) →
    * verify candidates against the true shingle sets → jaccard ≥ tau.
    * Approximate in recall (banding), exact in precision (verify step).
    * The signature never leaves the scan task — no signature shuffle. */
  def minhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   tau: Double, numPerm: Int = 128, bands: Int = 32): DataFrame = {
    GraftFunctions.ensureRegistered(docs.sparkSession)
    val sh = docs.select(col(idCol).as("doc_id"),
      GraftFunctions.word_shingles(col(textCol), 3).as("sh"))
    val bandsDf = sh.select(col("doc_id"),
      posexplode(GraftFunctions.minhash_bands(col("sh"), numPerm, bands))
        .as(Seq("band", "h")))
    val cand = bucketPairs(bandsDf, Seq("band", "h"), col("doc_id"))
      .filter(col("__a") < col("__b"))
      .select(col("__a").as("doc_a"), col("__b").as("doc_b"))
      .distinct()
    verifyJaccard(cand, sh, tau)
  }

  // -------------------------------------------------------------- SimHash

  /** SimHash near-dup pairs: 64-bit simhash (native codegen'd Expression),
    * split into 4×16-bit chunks. By pigeonhole, any pair with Hamming
    * distance < 4 shares at least one exact chunk (and near-dups at
    * slightly larger distances still collide on ≥1 chunk in practice) —
    * the chunk equi-join bounds candidates, then `bit_count(a^b)`
    * verifies the true distance. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int): DataFrame = {
    GraftFunctions.ensureRegistered(docs.sparkSession)
    val sig = docs.select(col(idCol).as("doc_id"),
      GraftFunctions.simhash64(TextOps.tokens(col(textCol))).as("sig"))
    val chunks = sig.select(col("doc_id"), col("sig"),
      posexplode(array((0 until 4).map(k =>
        shiftright(col("sig"), k * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("chunk", "cv")))
    bucketPairs(chunks, Seq("chunk", "cv"), struct(col("doc_id"), col("sig")))
      .filter(col("__a.doc_id") < col("__b.doc_id"))
      .select(col("__a.doc_id").as("doc_a"), col("__b.doc_id").as("doc_b"),
        bit_count(col("__a.sig").bitwiseXOR(col("__b.sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("doc_a", "doc_b")
  }

  // ------------------------------------------------------- n-gram Jaccard

  /** Exact n-gram Jaccard pairs via a prefix-filtered inverted-index join
    * (PPJoin-style; Xiao et al. 2008, "Efficient similarity joins for
    * near duplicate detection").
    *
    * Candidate generation indexes only each doc's PREFIX — its
    * `n - ceil(tau*n) + 1` globally-rarest shingles (global frequency
    * order): two sets with Jaccard ≥ tau must overlap within both
    * prefixes, so the filter is complete. Verification then computes
    * exact Jaccard from the full shingle sets.
    *
    * At web-corpus scale (Zipfian shingle frequencies) this is the
    * load-bearing choice: a plain shared-shingle index generates a
    * candidate pair-row for every co-occurrence of every common shingle
    * (quadratic in the hottest posting list), while the prefix index
    * bounds posting lists to rare shingles.
    *
    * `prefixFilter = false` selects the plain count-based index instead:
    * cheaper when the shingle space is small/uniform so no posting list
    * is pathologically hot (e.g. narrow-vocabulary corpora, where the
    * prefix is barely selective and its extra freq/rank stages dominate).
    * Both strategies are exact and return identical pairs. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        w: Int, tau: Double,
                        prefixFilter: Boolean = true): DataFrame = {
    GraftFunctions.ensureRegistered(docs.sparkSession)
    val sh = docs.select(col(idCol).as("doc_id"),
      GraftFunctions.word_shingles(col(textCol), w).as("sh"))
    val inv = sh.select(col("doc_id"), size(col("sh")).as("n"),
      explode(col("sh")).as("s"))
    if (prefixFilter) {
      val freq = inv.groupBy("s").agg(count(lit(1)).as("f"))
      val ranked = inv.join(freq, "s")
        .withColumn("rk", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("f"), col("s"))))
      // exact-decimal ceil: double tau*n can land epsilon above the true
      // product (0.07*100 = 7.000000000000001 → ceil 8), shortening the
      // prefix below the completeness bound; decimal arithmetic is exact
      val tauDec = lit(new java.math.BigDecimal(tau.toString))
      val prefix = ranked.filter(col("rk") <= col("n") - ceil(tauDec * col("n")) + 1)
      val cand = bucketPairs(prefix.select(col("doc_id"), col("s")), Seq("s"), col("doc_id"))
        .filter(col("__a") < col("__b"))
        .select(col("__a").as("doc_a"), col("__b").as("doc_b"))
        .distinct()
      verifyJaccard(cand, sh, tau)
    } else {
      val sizes = sh.select(col("doc_id"), size(col("sh")).as("n"))
      bucketPairs(inv.select(col("doc_id"), col("s")), Seq("s"), col("doc_id"))
        .filter(col("__a") < col("__b"))
        .groupBy(col("__a").as("doc_a"), col("__b").as("doc_b"))
        .agg(count(lit(1)).as("shared"))
        .join(sizes.select(col("doc_id"), col("n").as("na")), col("doc_a") === col("doc_id"))
        .drop("doc_id")
        .join(sizes.select(col("doc_id"), col("n").as("nb")), col("doc_b") === col("doc_id"))
        .drop("doc_id")
        .withColumn("jaccard", col("shared") / (col("na") + col("nb") - col("shared")))
        .filter(col("jaccard") >= tau)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    }
  }

  // --------------------------------------------------------- embedding dup

  /** Embedding near-dup pairs: exact cosine ≥ tau over all id-ordered pairs.
    * Cosine uses Similarity.cosine (deterministic left-fold dot product).
    * This is the exact small/medium-corpus path; at 100 TB the LSH-bucketed
    * candidate generation of Similarity.annLsh bounds the pair space and
    * this same verify runs per bucket. */
  def embedPairs(emb: DataFrame, idCol: String, vecCol: String,
                 tau: Double): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(emb.sparkSession)
    // sqrt-norms are per-row facts: compute them once on each side of the
    // join instead of re-deriving inside every pair's cosine.
    val e = emb.select(col(idCol).as("vid"),
      col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(Similarity.dot(col("v"), col("v"))))
    e.as("a").join(e.as("b"), col("a.vid") < col("b.vid"))
      .select(col("a.vid").as("id_a"), col("b.vid").as("id_b"),
        (Similarity.dot(col("a.v"), col("b.v")) /
          (col("a.nrm") * col("b.nrm"))).as("cos"))
      .filter(col("cos") >= tau)
      .orderBy("id_a", "id_b")
  }
}
