package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.functions.udaf

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a custom typed
  * `Aggregator` — point-FREQUENCY estimates from bounded memory, the
  * member of the sketch family the others don't cover (HLL++/KMV answer
  * "how many distinct", Misra-Gries "which are heavy", approx_percentile
  * "where are the quantiles"; CMS answers "how often does THIS key
  * occur" for any key, with one-sided error: est ≥ true always, and
  * est ≤ true + εN with probability 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉).
  *
  * The buffer is a flat d×w long matrix (d·w·8 bytes, fixed); reduce
  * increments one bucket per row via the seeded FNV-1a-64 of the key's
  * UTF-8 bytes (the simhash_wide re-seeding discipline: row i hashes
  * with basis ^ i·golden, so every row is an independent hash and the
  * whole sketch is REPRODUCIBLE IN SQL — the oracle rebuilds the exact
  * counts and estimates with the same fold); merge is elementwise sum —
  * commutative/associative, so partial aggregation combines map-side
  * like any builtin agg and estimates are bit-identical across
  * partitionings (the Mergeable Summaries property, same as the
  * Misra-Gries/KMV aggregators).
  *
  * `w` must be a power of two: bucket = hash & (w−1) keeps the bucket
  * arithmetic identical on the JVM (signed long) and in the oracle's
  * unsigned HUGEINT mod — the low bits agree regardless of sign.
  */
class CmsSketch(d: Int, w: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {
  require(d >= 1 && w >= 2 && (w & (w - 1)) == 0,
    s"need d >= 1 and w a power of two >= 2, got ($d, $w)")

  override def zero: Array[Long] = new Array[Long](d * w)

  override def reduce(buf: Array[Long], key: String): Array[Long] = {
    val bytes = (if (key == null) "" else key)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < d) {
      val h = SimHash64Impl.fnv1a64(bytes, CmsSketch.basisFor(i))
      buf(i * w + (h & (w - 1)).toInt) += 1L
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object CmsSketch {
  /** Row i's FNV basis — basis ^ i·golden, the simhash_wide re-seed rule
    * (64-bit overflow arithmetic; the oracle mirrors it mod 2^64). */
  def basisFor(i: Int): Long =
    SimHash64Impl.Basis ^ (i.toLong * SimHash64Impl.Golden)

  /** Untyped column handle: `df.agg(cms(4, 2048)(col("key_str")))` →
    * one ARRAY<BIGINT> of d·w counts. */
  def cms(d: Int, w: Int): Column => Column = {
    val agg = udaf(new CmsSketch(d, w))
    (c: Column) => agg(c)
  }
}
