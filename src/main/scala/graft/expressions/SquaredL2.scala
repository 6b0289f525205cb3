/* Declared inside org.apache.spark.sql so the expression can be wrapped
 * into a public Column via the (package-private) classic converters —
 * the standard packaging for third-party native expressions. */
package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native squared-L2 distance over two double vectors.
  *
  * On EQUAL-LENGTH vectors of non-null elements — the only inputs the
  * callers produce (both sides come from the same fixed-width
  * embedding pipeline) — this is bit-identical to
  * `aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0d, +)`:
  * same element order, same per-element `(x−y)²` then left-to-right
  * double accumulation (and the same as the k-means oracle's unrolled
  * `(v.x - c.c)^2` CTE sums). Outside that contract the two DIVERGE —
  * the HOF spelling returns NULL on a length mismatch or a null
  * element, while this loop (like [[FloatDot]], same convention)
  * truncates to the shorter length and reads null slots as 0.0; the
  * caller owns the well-formedness of its vectors. The codegen'd loop
  * reads both `ArrayData` buffers directly: no intermediate zipped
  * array, no lambda dispatch per element. On the Lloyd assignment
  * path this is the hot inner loop (vectors × K centroids × 64 dims
  * per iteration), [[FloatDot]]'s squared-distance sibling.
  */
case class SquaredL2(left: Expression, right: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "squared_l2"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i   = ctx.freshName("i")
      val n   = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d   = ctx.freshName("d")
      s"""
         |int $n = $a.numElements() < $b.numElements() ? $a.numElements() : $b.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SquaredL2 =
    copy(left = newLeft, right = newRight)
}

object SquaredL2 {
  /** Public Column API: `SquaredL2.dist2(a, b)` for two array<double> columns. */
  def dist2(a: Column, b: Column): Column =
    ExpressionUtils.column(SquaredL2(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
