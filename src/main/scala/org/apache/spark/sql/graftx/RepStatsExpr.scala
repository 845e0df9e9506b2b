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
}
