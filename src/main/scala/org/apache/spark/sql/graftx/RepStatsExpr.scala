package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the repetition-metrics kernel
  * (TextAnalysis.repetitionMetrics).
  *
  * The declarative form needs four higher-order-function arrays per doc
  * (split, zip_with bigrams, two array_distincts, a sort + run-length
  * aggregate) — and lambda expressions evaluate OUTSIDE whole-stage
  * codegen, interpreted, with every array materialized.  This expression
  * computes all five counting statistics in ONE scan of the string with
  * two small hash containers and no intermediate arrays, and participates
  * in whole-stage codegen via a static kernel call (measured ~4× on the
  * 10× corpus).
  *
  * Semantics are pinned to the declarative/oracle form: tokens are
  * maximal runs of [a-z0-9] in the `lower()`-cased text (the regex
  * `[^a-z0-9]+` split), bigrams are adjacent-token pairs joined with a
  * single space, all equality is exact string equality.
  */
case class RepStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = RepStats.schema
  override def prettyName: String = "rep_stats"
  override def nullable: Boolean = true

  override def nullSafeEval(t: Any): Any =
    RepStats.kernel(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = org.apache.spark.sql.graftx.RepStats.kernel($x);")

  override protected def withNewChildInternal(newChild: Expression): RepStats =
    copy(child = newChild)
}

object RepStats {
  val schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("top", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("n_bigrams", IntegerType, nullable = false),
    StructField("n_bigrams_distinct", IntegerType, nullable = false)))

  @inline private def isTok(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')

  /** One pass over the lower-cased text: token runs feed a count map
    * (top/total/distinct) and adjacent pairs feed a bigram set.  Called
    * from generated code — must stay a static, allocation-light method.
    */
  def kernel(u: UTF8String): InternalRow = {
    val s = u.toLowerCase.toString
    val counts = new java.util.HashMap[String, Integer]()
    val bigrams = new java.util.HashSet[String]()
    var total = 0L
    var top = 0
    var nBigrams = 0
    var prev: String = null
    var i = 0
    val len = s.length
    while (i < len) {
      if (isTok(s.charAt(i))) {
        val start = i
        while (i < len && isTok(s.charAt(i))) i += 1
        val w = s.substring(start, i)
        total += 1
        val n = counts.merge(w, 1, { (a: Integer, b: Integer) => Integer.valueOf(a + b) })
        if (n > top) top = n
        if (prev != null) { nBigrams += 1; bigrams.add(prev + " " + w) }
        prev = w
      } else i += 1
    }
    new GenericInternalRow(Array[Any](total, top, counts.size, nBigrams, bigrams.size))
  }
}

/** Distinct word-`n`-gram hashes of the lower-cased text, one string
  * scan, no intermediate arrays — the native form of the
  * split → zip_with-chain → array_distinct → xxhash64 pipeline used by
  * the dedup/decontamination tier (each zip_with link evaluates an
  * interpreted lambda and materializes a full array of ever-longer gram
  * strings).  Hash is FNV-1a + splitmix64 finalizer over the gram bytes
  * ("w1 w2 … wn") — 64-bit, the same family the repo's Hashing kernels
  * use; any collision-free hash is observationally equivalent for
  * set-intersection consumers (within-doc collision odds ~L²·2⁻⁶⁴).
  *
  * Tokenization is identical to [[RepStats]]: maximal [a-z0-9] runs of
  * the `lower()`-cased text.
  */
case class NgramHashes(child: Expression, n: Int, ws: Boolean = false)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"n must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hashes"
  override def nullable: Boolean = true

  override def nullSafeEval(t: Any): Any =
    NgramHashes.kernel(t.asInstanceOf[UTF8String], n, ws)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = org.apache.spark.sql.graftx.NgramHashes.kernel($x, $n, $ws);")

  override protected def withNewChildInternal(newChild: Expression): NgramHashes =
    copy(child = newChild)
}

object NgramHashes {
  @inline private def isTok(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')

  // Java regex \s — what Spark's split(text, "\\s+") separates on
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  // the repo's one splitmix64 finalizer — consumers only test equality,
  // so sharing the kernel beats a near-duplicate constant block here
  @inline private def mix64(z: Long): Long = graft.functions.Hashing.mix64(z)

  /** FNV-1a over the chars of words [i-n+1 .. i] joined by ' ', then the
    * splitmix64 finalizer.  Called from generated code.
    *
    * Both modes lower-case first.  `ws = false`: tokens are [a-z0-9] runs
    * (the `split(lower(t), "[^a-z0-9]+")` tokenizer).  `ws = true`:
    * tokens are non-whitespace runs, punctuation preserved (the
    * `split(lower(t), "\\s+")` tokenizer used by
    * Dedup.jaccardNearDupPairs).
    */
  def kernel(u: UTF8String, n: Int, ws: Boolean): org.apache.spark.sql.catalyst.util.ArrayData = {
    val s = u.toLowerCase.toString
    val words = new java.util.ArrayList[String]()
    var i = 0
    val len = s.length
    while (i < len) {
      val tok = if (ws) !isWs(s.charAt(i)) else isTok(s.charAt(i))
      if (tok) {
        val start = i
        while (i < len && (if (ws) !isWs(s.charAt(i)) else isTok(s.charAt(i)))) i += 1
        words.add(s.substring(start, i))
      } else i += 1
    }
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    var w0 = 0
    while (w0 + n <= words.size) {
      var h = 0xcbf29ce484222325L // FNV-1a offset basis
      var k = 0
      while (k < n) {
        if (k > 0) h = (h ^ ' '.toLong) * 0x100000001b3L
        val w = words.get(w0 + k)
        var c = 0
        while (c < w.length) {
          h = (h ^ w.charAt(c).toLong) * 0x100000001b3L
          c += 1
        }
        k += 1
      }
      out.add(java.lang.Long.valueOf(mix64(h)))
      w0 += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(arr)
  }
}

/** Span-coverage scrub kernel for TextAnalysis.dedupSpans: given a doc's
  * tokens and the 0-based START positions of duplicated `k`-grams, drop
  * every token covered by any interval `[s, s+k)` and re-join the rest.
  *
  * The declarative form was a per-token `exists(starts, s ≤ p < s+k)`
  * HOF — O(T·S) per doc with two interpreted lambdas per token, which
  * degrades exactly on span-DENSE corpora (S → T) where dedup matters
  * most.  This kernel sorts the starts (S log S, S ≤ T) and merges
  * intervals with the positions in ONE forward pass: a cursor absorbs
  * each start as the scan reaches it, extending the covered horizon
  * `max(s + k)` — O(T + S log S) total, no intermediate arrays, inside
  * whole-stage codegen via a static call.
  */
case class SpanScrub(toks: Expression, starts: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {
  require(k >= 1, s"k must be >= 1, got $k")

  override def left: Expression = toks
  override def right: Expression = starts
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(IntegerType))
  override def dataType: DataType = SpanScrub.schema
  override def prettyName: String = "span_scrub"
  override def nullable: Boolean = true

  override def nullSafeEval(t: Any, s: Any): Any =
    SpanScrub.kernel(
      t.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      s.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, s) =>
      s"${ev.value} = org.apache.spark.sql.graftx.SpanScrub.kernel($t, $s, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpanScrub =
    copy(toks = newLeft, starts = newRight)
}

object SpanScrub {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_dropped", LongType, nullable = false),
    StructField("clean_text", StringType, nullable = false)))

  /** Sorted-interval merge: one pass over positions, absorbing each start
    * when the scan reaches it.  Called from generated code.
    */
  def kernel(toksData: org.apache.spark.sql.catalyst.util.ArrayData,
             startsData: org.apache.spark.sql.catalyst.util.ArrayData,
             k: Int): InternalRow = {
    val nTok = toksData.numElements()
    val nS = startsData.numElements()
    val starts = new Array[Int](nS)
    var i = 0
    while (i < nS) { starts(i) = startsData.getInt(i); i += 1 }
    java.util.Arrays.sort(starts)
    val sb = new java.lang.StringBuilder()
    var dropped = 0L
    var ptr = 0
    var coverEnd = 0
    var p = 0
    while (p < nTok) {
      while (ptr < nS && starts(ptr) <= p) {
        val e = starts(ptr) + k
        if (e > coverEnd) coverEnd = e
        ptr += 1
      }
      if (p < coverEnd) dropped += 1L
      else {
        if (sb.length() > 0) sb.append(' ')
        sb.append(toksData.getUTF8String(p).toString)
      }
      p += 1
    }
    new GenericInternalRow(Array[Any](
      nTok.toLong, dropped, UTF8String.fromString(sb.toString)))
  }
}

/** Column API for the text-statistics native expressions. */
object TextColumns {
  /** struct(n_words, top, n_distinct, n_bigrams, n_bigrams_distinct). */
  def repStats(text: Column): Column =
    ExpressionUtils.column(RepStats(ExpressionUtils.expression(text)))

  /** distinct word-n-gram hashes (array<long>), one scan. */
  def ngramHashes(text: Column, n: Int): Column =
    ExpressionUtils.column(NgramHashes(ExpressionUtils.expression(text), n))

  /** same, with the whitespace tokenizer (punctuation preserved). */
  def ngramHashesWs(text: Column, n: Int): Column =
    ExpressionUtils.column(NgramHashes(ExpressionUtils.expression(text), n, ws = true))

  /** struct(n_tokens, n_dropped, clean_text): drop tokens covered by any
    * duplicated-gram interval [s, s+k), sorted-interval merge in O(T+S log S).
    */
  def spanScrub(toks: Column, starts: Column, k: Int): Column =
    ExpressionUtils.column(SpanScrub(
      ExpressionUtils.expression(toks), ExpressionUtils.expression(starts), k))
}
