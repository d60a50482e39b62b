package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  // -------------------------------------------------------------- MinHash

  private val Prime = 2147483647L // 2^31 - 1
  /** Deterministic permutation coefficients (seeded; a in [1,p), b in [0,p)). */
  private def perms(numPerm: Int): Array[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Array.fill(numPerm)((1L + rnd.nextInt(Int.MaxValue - 1).toLong,
      rnd.nextInt(Int.MaxValue).toLong))
  }

  /** MinHash signature column: array<long> of length numPerm over a
    * shingle-array column. sig[p] = min over shingles of
    * ((a_p * h32(sh) + b_p) mod 2^31-1), h32 = low 31 bits of xxhash64.
    * Pure expression tree — evaluated in a single pass over each row's
    * shingle array, no shuffle. */
  def minhashSignature(shingleArr: Column, numPerm: Int): Column = {
    val hs = transform(shingleArr, sh => xxhash64(sh).bitwiseAND(lit(0x7fffffffL)))
    val ps = perms(numPerm)
    array(ps.map { case (a, b) =>
      array_min(transform(hs, h => (h * a + b) % Prime))
    }: _*)
  }

  /** Banded LSH hash list: bands of `rowsPerBand` signature slots, each
    * hashed to one long — docs agreeing on any band become candidates. */
  def bandHashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      xxhash64(lit(b), concat_ws(",",
        slice(sig, b * rowsPerBand + 1, rowsPerBand).cast("array<string>")))
    }: _*)

  /** MinHash+LSH near-dup pairs with exact-Jaccard verification.
    * Pipeline: shingle → 128-perm minhash → 32×4 banded LSH →
    * band-bucket equi-join (only ids + one 8-byte band hash shuffle) →
    * verify candidates against the true shingle sets → jaccard ≥ tau.
    * Approximate in recall (banding), exact in precision (verify step). */
  def minhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   tau: Double, numPerm: Int = 128, bands: Int = 32): DataFrame = {
    val rowsPerBand = numPerm / bands
    val sh = docs.select(col(idCol).as("doc_id"),
      TextOps.shingles(TextOps.tokens(col(textCol)), 3).as("sh"))
    val sig = sh.select(col("doc_id"),
      bandHashes(minhashSignature(col("sh"), numPerm), bands, rowsPerBand).as("bh"))
    val bandsDf = sig.select(col("doc_id"), posexplode(col("bh")).as(Seq("band", "h")))
    val cand = bandsDf.as("a").join(bandsDf.as("b"),
        col("a.band") === col("b.band") && col("a.h") === col("b.h") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val withSets = cand
      .join(sh.select(col("doc_id"), col("sh").as("sh_a")), col("doc_a") === col("doc_id"))
      .drop("doc_id")
      .join(sh.select(col("doc_id"), col("sh").as("sh_b")), col("doc_b") === col("doc_id"))
      .drop("doc_id")
    withSets
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("inter") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= tau)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  // -------------------------------------------------------------- SimHash

  /** SimHash near-dup pairs: 64-bit simhash (native codegen'd Expression),
    * split into 4×16-bit chunks; by pigeonhole any pair within Hamming
    * distance ≤ 3·(chunks-1)/... shares at least one exact chunk when
    * ham < chunks, and in practice near-dups collide on ≥1 chunk — the
    * chunk equi-join bounds candidates, then `bit_count(a^b)` verifies. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int): DataFrame = {
    GraftFunctions.ensureRegistered(docs.sparkSession)
    val sig = docs.select(col(idCol).as("doc_id"),
      GraftFunctions.simhash64(TextOps.tokens(col(textCol))).as("sig"))
    val chunks = sig.select(col("doc_id"), col("sig"),
      posexplode(array((0 until 4).map(k =>
        shiftright(col("sig"), k * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("chunk", "cv")))
    chunks.as("a").join(chunks.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.cv") === col("b.cv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("doc_a", "doc_b")
  }

  // ------------------------------------------------------- n-gram Jaccard

  /** Exact n-gram Jaccard pairs via inverted-index join: explode distinct
    * shingles, equi-join on shingle, count shared per pair, compute exact
    * jaccard. Complete for tau > 0 (any qualifying pair shares ≥1 shingle),
    * and the join shuffles (shingle, id) rows only. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        w: Int, tau: Double): DataFrame = {
    val sh = docs.select(col(idCol).as("doc_id"),
      TextOps.shingles(TextOps.tokens(col(textCol)), w).as("sh"))
    val sizes = sh.select(col("doc_id"), size(col("sh")).as("n"))
    val inv = sh.select(col("doc_id"), explode(col("sh")).as("s"))
    inv.as("a").join(inv.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
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

  // --------------------------------------------------------- embedding dup

  /** Embedding near-dup pairs: exact cosine ≥ tau over all id-ordered pairs.
    * Cosine uses Similarity.cosine (deterministic left-fold dot product).
    * This is the exact small/medium-corpus path; at 100 TB the LSH-bucketed
    * candidate generation of Similarity.annLsh bounds the pair space and
    * this same verify runs per bucket. */
  def embedPairs(emb: DataFrame, idCol: String, vecCol: String,
                 tau: Double): DataFrame = {
    val e = emb.select(col(idCol).as("vid"),
      col(vecCol).cast("array<double>").as("v"))
    e.as("a").join(e.as("b"), col("a.vid") < col("b.vid"))
      .select(col("a.vid").as("id_a"), col("b.vid").as("id_b"),
        Similarity.cosine(col("a.v"), col("b.v")).as("cos"))
      .filter(col("cos") >= tau)
      .orderBy("id_a", "id_b")
  }
}
