package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, Sqrt}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the vector hot path (SURVEY §7.3:
  * "a native Catalyst `Expression` (with doGenCode) beats a Scala UDF").
  *
  * The similarity operators evaluate millions of dot products per task
  * (n² candidate pairs). The `zip_with`+`aggregate` higher-order-function
  * form allocates an intermediate array and evaluates a lambda per
  * element; this compiles to a primitive loop inside whole-stage codegen —
  * no allocation, no per-element lambda dispatch.
  *
  * Accumulation is double, in index order — bit-identical to the HOF form
  * and to DuckDB's `list_inner_product` (which the oracle uses).
  *
  * Lives under `org.apache.spark.sql` because `AbstractDataType` and the
  * classic Column↔Expression bridge are `private[sql]` — the usual
  * packaging for third-party native expressions.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullable: Boolean = true

  /** Ragged (length-mismatched) pairs and null elements yield null — a
    * truncated or zero-filled dot product would be a plausible-but-wrong
    * similarity; null surfaces the data problem.
    */
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): FloatVecDot =
    copy(left = l, right = r)
}

/** Public Column API over the native expressions. */
object VecColumns {
  private def expr(c: Column): Expression = ExpressionUtils.expression(c)

  /** Σ aᵢ·bᵢ as a codegen'd primitive loop over float arrays. */
  def vecDot(a: Column, b: Column): Column =
    ExpressionUtils.column(FloatVecDot(expr(a), expr(b)))

  /** ‖a‖ via the same accumulation (sqrt of self-dot). */
  def vecNorm(a: Column): Column = {
    val e = expr(a)
    ExpressionUtils.column(Sqrt(FloatVecDot(e, e)))
  }

  /** cosine(a, b) with per-operand norms — callers that score many pairs
    * should precompute norms per side instead (see Similarity).
    */
  def vecCosine(a: Column, b: Column): Column =
    vecDot(a, b) / (vecNorm(a) * vecNorm(b))
}
