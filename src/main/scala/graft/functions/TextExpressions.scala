package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
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

/** Single-pass within-document repetition statistics (the Gopher-style
  * quality gates — Rae et al. 2021 table A1): duplicate-token /
  * duplicate-2-gram / duplicate-3-gram fractions and the top single
  * token's frequency share, as one struct from ONE walk of the token
  * array.
  *
  * Replaces the builtin-HOF composition (interpreted `transform` /
  * `filter` lambdas; the top-token share alone was a filter-scan per
  * distinct token, O(distinct·n) per doc — 27s of a 65s sf0.1 suite).
  * Here: tokens are interned to dense ids (one UTF8String hash probe
  * each); 2-grams key an open-addressing long map with
  * (id(i-1)+1)<<32 | (id(i)+1); 3-grams reuse the 2-gram's dense id,
  * (gram2id(i-1)+1)<<32 | (id(i)+1) — so every statistic, including the
  * exact top-token count, falls out of the same O(n) pass with O(distinct)
  * memory bounded by document length, not corpus size.
  *
  * Tokens never contain the separator (they come from split(text, ' ')),
  * so id-tuple keys are exactly equivalent to the space-joined gram
  * strings the DuckDB oracle uses. */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = RepetitionStatsImpl.schema
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats expects ARRAY<STRING>, got ${t.sql}")
  }
  override def nullSafeEval(input: Any): Any =
    RepetitionStatsImpl.compute(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepetitionStatsImpl.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
  override def prettyName: String = "repetition_stats"
}

object RepetitionStatsImpl {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("dup_token_frac", DoubleType, nullable = false),
    StructField("dup_2gram_frac", DoubleType, nullable = false),
    StructField("dup_3gram_frac", DoubleType, nullable = false),
    StructField("top_token_frac", DoubleType, nullable = false)))

  /** Open-addressing long→int map (power-of-2 capacity, murmur-mixed
    * probe). Keys are built from id+1 halves so 0 never occurs and serves
    * as the empty sentinel. Used both as an id-assigner (2-grams) and a
    * distinct-counter (3-grams, value ignored). */
  private final class LongIdMap(initCap: Int) {
    private var cap = Integer.highestOneBit(math.max(initCap, 16) - 1) << 1
    private var keys = new Array[Long](cap)
    private var vals = new Array[Int](cap)
    var size = 0

    private def mix(k: Long): Int = {
      var h = k * -7046029254386353131L
      h ^= h >>> 32
      (h & (cap - 1)).toInt
    }

    /** Existing value for `key`, or insert `newVal` and return -1. */
    def getOrInsert(key: Long, newVal: Int): Int = {
      var i = mix(key)
      while (keys(i) != 0L) {
        if (keys(i) == key) return vals(i)
        i = (i + 1) & (cap - 1)
      }
      keys(i) = key
      vals(i) = newVal
      size += 1
      if (size * 4 > cap * 3) grow()
      -1
    }

    private def grow(): Unit = {
      val oldKeys = keys; val oldVals = vals
      cap <<= 1
      keys = new Array[Long](cap)
      vals = new Array[Int](cap)
      var i = 0
      while (i < oldKeys.length) {
        val k = oldKeys(i)
        if (k != 0L) {
          var j = mix(k)
          while (keys(j) != 0L) j = (j + 1) & (cap - 1)
          keys(j) = k
          vals(j) = oldVals(i)
        }
        i += 1
      }
    }
  }

  def compute(tokens: ArrayData): InternalRow = {
    val n = tokens.numElements()
    val tokIds = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer](
      math.max(16, n * 2))
    var tokCounts = new Array[Int](math.max(16, n))
    val gram2 = new LongIdMap(n)
    val gram3 = new LongIdMap(n)
    var maxCount = 0
    var prevId = -1      // token id at i-1
    var prevGram2Id = -1 // dense id of the 2-gram ending at i-1
    var i = 0
    while (i < n) {
      val tok = if (tokens.isNullAt(i)) org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
                else tokens.getUTF8String(i)
      var id = tokIds.size()
      val prev = tokIds.putIfAbsent(tok, Integer.valueOf(id))
      if (prev != null) id = prev.intValue()
      else if (id >= tokCounts.length)
        tokCounts = java.util.Arrays.copyOf(tokCounts, tokCounts.length * 2)
      tokCounts(id) += 1
      if (tokCounts(id) > maxCount) maxCount = tokCounts(id)
      var gram2Id = -1
      if (prevId >= 0) {
        val key2 = ((prevId + 1).toLong << 32) | ((id + 1).toLong & 0xffffffffL)
        gram2Id = gram2.getOrInsert(key2, gram2.size)
        if (gram2Id < 0) gram2Id = gram2.size - 1
        if (prevGram2Id >= 0) {
          val key3 = ((prevGram2Id + 1).toLong << 32) | ((id + 1).toLong & 0xffffffffL)
          gram3.getOrInsert(key3, 0)
        }
      }
      prevGram2Id = gram2Id
      prevId = id
      i += 1
    }
    val n2 = if (n >= 2) n - 1 else 0
    val n3 = if (n >= 3) n - 2 else 0
    new GenericInternalRow(Array[Any](
      n.toLong,
      if (n == 0) 0.0 else (n - tokIds.size()).toDouble / n,
      if (n2 == 0) 0.0 else (n2 - gram2.size).toDouble / n2,
      if (n3 == 0) 0.0 else (n3 - gram3.size).toDouble / n3,
      if (n == 0) 0.0 else maxCount.toDouble / n))
  }
}

/** Sliding-window token chunking (the RAG / context-window preparation
  * shape): split the document into chunks of `size` tokens starting every
  * `stride` tokens (overlap = size - stride), stopping once a chunk
  * reaches the document's end — the trailing chunk may be shorter, and
  * nothing after the first end-reaching chunk is emitted (no fully-
  * contained tail fragments). A single token walk in generated code;
  * composing the same thing from `transform(sequence(...), slice(...))`
  * evaluates interpreted per row (the r1 finding that motivated
  * word_shingles). `stride <= size` so every token is covered.
  *
  * The reference has no chunking surface (text columns page whole,
  * base.py:1472); this completes the packing/chunking pair of the
  * training-pipeline family (Packing concatenates small docs UP to a
  * budget; chunking cuts large docs DOWN to one). */
case class WordChunks(child: Expression, size: Int, stride: Int)
    extends UnaryExpression {
  require(size >= 1 && stride >= 1 && stride <= size,
    s"need 1 <= stride <= size, got size=$size stride=$stride")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_chunks expects STRING, got ${t.sql}")
  }
  override def nullSafeEval(input: Any): Any =
    WordChunksImpl.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], size, stride)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordChunksImpl.compute($c, $size, $stride)")
  override protected def withNewChildInternal(newChild: Expression): WordChunks =
    copy(child = newChild)
  override def prettyName: String = "word_chunks"
}

object WordChunksImpl {
  def compute(text: org.apache.spark.unsafe.types.UTF8String,
              size: Int, stride: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val n = toks.length
    val buf = new scala.collection.mutable.ArrayBuffer[Any]()
    var i = 0
    var done = false
    while (!done) {
      val end = math.min(i + size, n)
      val sb = new java.lang.StringBuilder()
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      buf += org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
      if (end >= n) done = true else i += stride
    }
    new GenericArrayData(buf.toArray)
  }
}

/** Within-word adjacent character pairs — the pair statistics of BPE
  * vocabulary induction's FIRST merge step (Sennrich et al. 2016 §3.2:
  * count symbol pairs over all word occurrences, merge the most
  * frequent). ONE pass over the text: anything outside [A-Za-z] is a
  * word separator, letters lowercase, and each ≥2-letter word emits its
  * adjacent pairs with multiplicity. ASCII-only tokenization BY DESIGN:
  * substr/char semantics on multi-byte text diverge between engines
  * (code points vs grapheme clusters), while the a-z subset is
  * bit-identical everywhere — the oracle rebuilds the same pairs with
  * string_split_regex + per-word substr fan-out. */
case class CharPairs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_pairs expects STRING, got ${t.sql}")
  }
  override def nullSafeEval(input: Any): Any =
    CharPairsImpl.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CharPairsImpl.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): CharPairs =
    copy(child = newChild)
  override def prettyName: String = "char_pairs"
}

object CharPairsImpl {
  def compute(text: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val s = text.toString
    val buf = new scala.collection.mutable.ArrayBuffer[Any]()
    val pair = new Array[Char](2)
    var prev: Char = 0 // 0 = no previous letter (word boundary)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val lower =
        if (c >= 'a' && c <= 'z') c
        else if (c >= 'A' && c <= 'Z') (c + 32).toChar
        else 0.toChar
      if (lower != 0) {
        if (prev != 0) {
          pair(0) = prev; pair(1) = lower
          buf += org.apache.spark.unsafe.types.UTF8String
            .fromString(new String(pair))
        }
        prev = lower
      } else prev = 0
      i += 1
    }
    new GenericArrayData(buf.toArray)
  }
}

/** Unicode NFC normalization (canonical composition) — the text-
  * canonicalization step that runs BEFORE any hash-based dedup: the same
  * visible string can arrive as composed ("é") or decomposed ("e"+U+0301)
  * code points, and md5/minhash/simhash all see different bytes until
  * the corpus is normalized to one form. A per-row codegen Expression
  * over java.text.Normalizer (no UDF, no interpreted path); DuckDB's
  * nfc_normalize implements the same Unicode algorithm, so the oracle is
  * engine-paired. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects STRING, got ${t.sql}")
  }
  override def nullSafeEval(input: Any): Any =
    NfcNormalizeImpl.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalizeImpl.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
  override def prettyName: String = "nfc_normalize"
}

object NfcNormalizeImpl {
  def compute(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    val str = s.toString
    // fast path: already-normalized (ASCII and most web text) strings
    // skip the composer entirely
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** All six quality-scoring sufficient statistics in ONE byte-level pass
  * (judge r9 ask #8): the composed-builtin quality projection paid two
  * regexp_replace scans, two split() array materializations, an
  * array_distinct and a marker probe per document — byte-linear but
  * multi-pass, the r9 100×-decade's 120× row. This Expression walks the
  * UTF-8 bytes once and returns struct(n_chars, n_tokens, word_chars,
  * n_punct, n_stop, n_distinct); the ratio columns divide these ints
  * scan-side (graft.operators.TextAnalysis.qualityCols).
  *
  * Exact parity contract with the composed plan (spec-asserted):
  * tokens split on the single space character (split(t, " ") keeps empty
  * tokens — n_tokens = spaces+1); n_chars counts CODE POINTS (Spark
  * length()); punct = code points outside [A-Za-z0-9 ]; stopword compare
  * is ASCII-case-insensitive against the English marker list (the
  * ASCII-only rule of CharPairs — non-ASCII tokens cannot equal an ASCII
  * marker); distinct over raw byte-exact tokens. */
case class QualityStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = QualityStatsImpl.schema
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"text_quality_stats expects STRING, got ${t.sql}")
  }
  override def nullSafeEval(input: Any): Any =
    QualityStatsImpl.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.QualityStatsImpl.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): QualityStats =
    copy(child = newChild)
  override def prettyName: String = "text_quality_stats"
}

object QualityStatsImpl {
  val schema: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("word_chars", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false)))

  /** The English marker vocabulary of TextAnalysis.Markers — stopword
    * counting shares it (spec-asserted equal). */
  val StopEn: Array[String] = Array("the", "and", "of", "to", "a", "in", "is")

  /** ASCII-case-insensitive match against StopEn, inlined per length so a
    * token probe is a handful of byte compares, no allocation. */
  private def isStop(b: Array[Byte], s: Int, len: Int): Boolean = {
    @inline def c(i: Int): Int = b(s + i) | 0x20
    len match {
      case 1 => c(0) == 'a'
      case 2 =>
        val (c0, c1) = (c(0), c(1))
        (c0 == 'o' && c1 == 'f') || (c0 == 't' && c1 == 'o') ||
          (c0 == 'i' && (c1 == 'n' || c1 == 's'))
      case 3 =>
        val (c0, c1, c2) = (c(0), c(1), c(2))
        (c0 == 't' && c1 == 'h' && c2 == 'e') ||
          (c0 == 'a' && c1 == 'n' && c2 == 'd')
      case _ => false
    }
  }

  def compute(text: org.apache.spark.unsafe.types.UTF8String): InternalRow = {
    val b = text.getBytes // may copy once; everything below is offset math
    val n = b.length
    var nChars = 0
    var nSpaces = 0
    var nPunct = 0
    var nStop = 0
    val distinct = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    var tokStart = 0
    var i = 0
    while (i <= n) {
      val atEnd = i == n
      val byt = if (atEnd) ' '.toByte else b(i)
      if (!atEnd && (byt & 0xc0) == 0x80) {
        // UTF-8 continuation byte: part of the current (non-ASCII) code
        // point — counted at its lead byte
        i += 1
      } else {
        if (atEnd || byt == ' ') {
          val len = i - tokStart
          distinct.add(org.apache.spark.unsafe.types.UTF8String
            .fromBytes(b, tokStart, len))
          if (isStop(b, tokStart, len)) nStop += 1
          tokStart = i + 1
          if (!atEnd) { nChars += 1; nSpaces += 1 }
        } else {
          nChars += 1
          val alnum = (byt >= 'A' && byt <= 'Z') || (byt >= 'a' && byt <= 'z') ||
            (byt >= '0' && byt <= '9')
          // any non-ASCII lead byte is outside [A-Za-z0-9 ] too
          if (!alnum) nPunct += 1
        }
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](
      nChars, nSpaces + 1, nChars - nSpaces, nPunct, nStop, distinct.size()))
  }
}
