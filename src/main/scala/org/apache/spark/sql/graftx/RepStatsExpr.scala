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

/** Column API for the text-statistics native expressions. */
object TextColumns {
  /** struct(n_words, top, n_distinct, n_bigrams, n_bigrams_distinct). */
  def repStats(text: Column): Column =
    ExpressionUtils.column(RepStats(ExpressionUtils.expression(text)))
}
