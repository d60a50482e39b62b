package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class HashExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("rolling_hash matches the definition, through codegen") {
    GraftFunctions.ensureRegistered(spark)
    def ref(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)
    val inputs = Seq("", "a", "abc", "the quick brown fox", "x" * 5000)
    val out = inputs.toDF("s")
      .select(GraftFunctions.rolling_hash(col("s"))).as[Long].collect()
    assert(out.toSeq == inputs.map(ref))
    // direct impl agrees (interpreted path)
    assert(RollingHashImpl.compute(UTF8String.fromString("abc")) == ref("abc"))
  }

  test("simhash64: identical token sets collide, disjoint ones differ") {
    GraftFunctions.ensureRegistered(spark)
    val df = Seq(
      (1L, Seq("a", "b", "c", "d")),
      (2L, Seq("a", "b", "c", "d")),
      (3L, Seq("w", "x", "y", "z", "q", "r", "s", "t"))
    ).toDF("id", "toks").select(col("id"), GraftFunctions.simhash64(col("toks")).as("h"))
    val m = df.as[(Long, Long)].collect().toMap
    assert(m(1L) == m(2L))
    assert(m(1L) != m(3L))
  }

  test("simhash hamming distance grows with token divergence") {
    val base = (1 to 40).map(i => s"tok$i")
    def sig(toks: Seq[String]): Long = {
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      SimHash64Impl.compute(new GenericArrayData(
        toks.map(t => UTF8String.fromString(t)).toArray[Any]))
    }
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val near = ham(sig(base), sig(base.updated(0, "changed")))
    val far = ham(sig(base), sig((1 to 40).map(i => s"other$i")))
    assert(near < far)
    assert(near <= 8)
  }
}
