package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WordChunksSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(text: String, size: Int, stride: Int): Seq[String] = {
    GraftFunctions.ensureRegistered(spark)
    Seq(text).toDF("t")
      .select(GraftFunctions.word_chunks(col("t"), size, stride).as("c"))
      .head().getSeq[String](0)
  }

  test("exact tiling at stride == size reassembles the document") {
    val text = (1 to 10).map(i => s"w$i").mkString(" ")
    val cs = chunksOf(text, 4, 4)
    assert(cs == Seq("w1 w2 w3 w4", "w5 w6 w7 w8", "w9 w10"))
    assert(cs.mkString(" ") == text)
  }

  test("overlapping chunks cover every token and stop at the end") {
    val text = (1 to 11).map(i => s"w$i").mkString(" ")
    val cs = chunksOf(text, 4, 3)
    assert(cs == Seq("w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10", "w10 w11"))
    // nothing after the first end-reaching chunk
    val ends = chunksOf((1 to 10).map(i => s"w$i").mkString(" "), 4, 3)
    assert(ends.last == "w7 w8 w9 w10" && ends.length == 3)
  }

  test("short and empty documents yield exactly one chunk") {
    assert(chunksOf("a b", 64, 48) == Seq("a b"))
    assert(chunksOf("", 64, 48) == Seq(""))
  }

  test("chunking rejects stride > size") {
    intercept[IllegalArgumentException] {
      WordChunks(org.apache.spark.sql.catalyst.expressions.Literal("x"), 4, 5)
    }
  }
}
