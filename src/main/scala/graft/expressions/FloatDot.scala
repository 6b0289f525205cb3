/* Declared inside org.apache.spark.sql so the expression can be wrapped
 * into a public Column via the (package-private) classic converters —
 * the standard packaging for third-party native expressions. */
package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two float32 vectors, accumulated in double.
  *
  * Semantically identical to
  * `aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0d, +)`
  * — same element order, same widening, bit-identical results (and the
  * same as DuckDB's `list_dot_product` on `::DOUBLE[]` casts, verified)
  * — but the codegen'd loop reads both `ArrayData` buffers directly:
  * no intermediate zipped array, no lambda dispatch per element. On the
  * brute-force cosine path this is the hot inner loop (probe × base ×
  * 64 elements), so it stays inside WholeStageCodegen with zero
  * per-pair allocation.
  */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "float_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements() < $b.numElements() ? $a.numElements() : $b.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): FloatDot =
    copy(left = newLeft, right = newRight)
}

object FloatDot {
  /** Public Column API: `FloatDot.dot(a, b)` for two array<float> columns. */
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(FloatDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
