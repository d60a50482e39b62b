package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.functions.{udaf, xxhash64}

/** KMV (k-minimum-values) distinct-count sketch as a custom typed
  * `Aggregator` (Beyer et al. 2007, "On synopses for distinct-value
  * estimation under multiset operations").
  *
  * The sketch keeps the k smallest 63-bit hashes seen; the estimator is
  * (k-1) / x_(k) where x_(k) is the k-th minimum mapped into [0,1).
  * Unlike reservoir sampling it is DETERMINISTIC and order-independent
  * (min-set union is commutative/associative), so estimates are
  * reproducible across partitionings and cluster sizes — the same
  * property graft's exact-decimal sums give numeric aggregates. The
  * merge is a k-way min-merge, so partial aggregation works map-side
  * like any builtin agg.
  *
  * Complements approx_count_distinct (HLL++): KMV sketches also support
  * set EXPRESSION estimates (union via merge, intersection via the
  * inclusion-exclusion over the combined k-min set), which HLL cannot do
  * without error blowup.
  */
class KmvDistinct(k: Int) extends Aggregator[Long, Array[Long], Double] {
  require(k >= 16, "k < 16 gives useless variance")

  override def zero: Array[Long] = Array.empty

  /** Insert one 63-bit hash, keeping the k smallest (array kept sorted). */
  override def reduce(buf: Array[Long], rawHash: Long): Array[Long] = {
    val h = rawHash & Long.MaxValue
    val idx = java.util.Arrays.binarySearch(buf, h)
    if (idx >= 0) buf // duplicate hash
    else {
      val ins = -idx - 1
      if (buf.length >= k) {
        if (ins >= k) buf
        else { // drop current max, insert
          val out = new Array[Long](k)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
          out
        }
      } else {
        val out = new Array[Long](buf.length + 1)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
        out
      }
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val merged = new Array[Long](a.length + b.length)
    System.arraycopy(a, 0, merged, 0, a.length)
    System.arraycopy(b, 0, merged, a.length, b.length)
    java.util.Arrays.sort(merged)
    // distinct + truncate to k
    val out = new scala.collection.mutable.ArrayBuffer[Long](k)
    var i = 0
    while (i < merged.length && out.length < k) {
      if (out.isEmpty || out.last != merged(i)) out += merged(i)
      i += 1
    }
    out.toArray
  }

  override def finish(buf: Array[Long]): Double =
    if (buf.length < k) buf.length.toDouble // exact below k
    else (k - 1).toDouble / (buf.last.toDouble / Long.MaxValue.toDouble)

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object KmvSketch {
  /** Untyped column handle: `df.agg(kmvDistinct(256)(col("x")))`. The
    * input column is hashed with xxhash64 (codegen'd) before sketching. */
  def kmvDistinct(k: Int): Column => Column = {
    val agg = udaf(new KmvDistinct(k))
    (c: Column) => agg(xxhash64(c))
  }
}
