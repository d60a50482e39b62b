package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bloom filter (Bloom 1970) as a typed `Aggregator` + a native codegen
  * probe Expression — the PRE-SHUFFLE row-pruning half of a selective
  * join (Spark's own runtime row-level filtering applies the same idea
  * behind AQE; here it is a first-class operator the caller composes,
  * cf. operators/Joins.bloomSemiJoin).
  *
  * State is a flat bit array in Long words; k bit positions per key come
  * from double hashing (Kirsch & Mitzenmacher 2006: pos_i = h1 + i·h2,
  * full 64-bit overflow arithmetic) over the seeded FNV-1a-64 of the
  * key's UTF-8 bytes — the CmsSketch re-seeding discipline, so the
  * sketch is deterministic and merge (bitwise OR) is commutative/
  * associative: partial aggregation combines map-side and the bytes are
  * IDENTICAL under any partitioning (spec-asserted).
  *
  * `mBits` must be a power of two: position = hash & (mBits−1), the
  * same mask rule as CmsSketch/w. No false negatives ever (a member's
  * bits are all set by construction); false positives pass the probe
  * and are killed by the exact join that follows — superset prefilter
  * + exact verify, the repo's standard two-phase shape. */
class BloomSketch(kHashes: Int, mBits: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {
  require(kHashes >= 1 && kHashes <= 16, s"need 1 <= k <= 16, got $kHashes")
  require(mBits >= 64 && (mBits & (mBits - 1)) == 0,
    s"mBits must be a power of two >= 64, got $mBits")

  override def zero: Array[Long] = new Array[Long](mBits / 64)

  override def reduce(buf: Array[Long], key: String): Array[Long] = {
    BloomImpl.set(buf, if (key == null) "" else key, kHashes)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object BloomSketch {
  /** Untyped column handle: `dim.agg(bloom(5, 1 << 17)(col("k")))` →
    * one ARRAY<BIGINT> of mBits/64 words. */
  def bloom(kHashes: Int, mBits: Int): Column => Column = {
    val agg = udaf(new BloomSketch(kHashes, mBits))
    (c: Column) => agg(c)
  }
}

object BloomImpl {
  private def h12(key: String): (Long, Long) = {
    val bytes = key.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    (SimHash64Impl.fnv1a64(bytes, CmsSketch.basisFor(0)),
      SimHash64Impl.fnv1a64(bytes, CmsSketch.basisFor(1)))
  }

  def set(words: Array[Long], key: String, k: Int): Unit = {
    val (h1, h2) = h12(key)
    val mask = words.length.toLong * 64L - 1L
    var i = 0
    while (i < k) {
      val pos = ((h1 + i.toLong * h2) & mask).toInt
      words(pos >>> 6) |= 1L << (pos & 63)
      i += 1
    }
  }

  /** Callable from generated Java (static forwarder). */
  def contains(words: ArrayData, key: UTF8String, k: Int): Boolean = {
    val n = words.numElements()
    val (h1, h2) = h12(if (key == null) "" else key.toString)
    val mask = n.toLong * 64L - 1L
    var i = 0
    while (i < k) {
      val pos = ((h1 + i.toLong * h2) & mask).toInt
      if ((words.getLong(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

/** Scan-side Bloom probe: `bloom_contains(words, key, k)` — stays inside
  * whole-stage codegen so the pruning filter runs at columnar-read speed
  * (the point of the exercise: kill non-matching fact rows BEFORE the
  * shuffle on a 100 TB scan). */
case class BloomContains(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), _: StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_contains needs (array<bigint>, string), got ($l, $r)")
    }
  override def prettyName: String = "bloom_contains"

  override protected def nullSafeEval(words: Any, key: Any): Any =
    BloomImpl.contains(words.asInstanceOf[ArrayData],
      key.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, s) =>
      s"graft.functions.BloomImpl.contains($w, $s, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
