package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Multi-vocabulary marker counting in ONE token pass.
  *
  * The language-ID / stopword scoring shape is "count, per vocabulary,
  * how many tokens are in it". Composed from builtins that is one
  * `filter(toks, t -> array_contains(vocab, t))` pass PER VOCABULARY —
  * interpreted higher-order functions, 4 scans of the token array for 4
  * languages (the r3 bench's slowest query). This native Expression walks
  * the tokens once, probing a prebuilt token → vocab-bitmask hash map
  * (a codegen reference object, built once on the driver and shipped with
  * the plan), and returns all counts as one array<int>. */
case class MarkerCounts(child: Expression, vocabs: Seq[Seq[String]])
  extends UnaryExpression {
  require(vocabs.nonEmpty && vocabs.length <= 30,
    "marker_counts supports 1..30 vocabularies (bitmask-indexed)")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"marker_counts expects ARRAY<STRING>, got ${t.sql}")
  }

  /** token → bitmask of the vocabularies containing it. UTF8String keys
    * so per-token probes need no String materialization. Built once per
    * expression instance; rides into tasks as one reference object
    * (UTF8String is Externalizable). */
  private lazy val index: java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer] = {
    val m = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer]()
    vocabs.zipWithIndex.foreach { case (vocab, i) =>
      vocab.foreach { tok =>
        val k = org.apache.spark.unsafe.types.UTF8String.fromString(tok)
        val prev = m.get(k)
        m.put(k, Integer.valueOf((if (prev == null) 0 else prev.intValue()) | (1 << i)))
      }
    }
    m
  }

  override def nullSafeEval(input: Any): Any =
    MarkerCountsImpl.compute(input.asInstanceOf[ArrayData], index, vocabs.length)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idxRef = ctx.addReferenceObj("graftMarkerIdx", index, "java.util.HashMap")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MarkerCountsImpl.compute($c, $idxRef, ${vocabs.length})")
  }
  override protected def withNewChildInternal(newChild: Expression): MarkerCounts =
    copy(child = newChild)
  override def prettyName: String = "marker_counts"
}

object MarkerCountsImpl {
  def compute(tokens: ArrayData,
              index: java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer],
              nVocabs: Int): ArrayData = {
    val counts = new Array[Int](nVocabs)
    var i = 0
    while (i < tokens.numElements()) {
      if (!tokens.isNullAt(i)) {
        val m = index.get(tokens.getUTF8String(i))
        if (m != null) {
          var mask = m.intValue()
          while (mask != 0) {
            val j = java.lang.Integer.numberOfTrailingZeros(mask)
            counts(j) += 1
            mask &= mask - 1
          }
        }
      }
      i += 1
    }
    new GenericArrayData(counts)
  }
}
