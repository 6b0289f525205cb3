/* Declared inside org.apache.spark.sql so the expression can be wrapped
 * into a public Column via the (package-private) classic converters —
 * the standard packaging for third-party native expressions. */
package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType}

/** Count of elements of a SORTED (non-decreasing) double array that are
  * strictly less than `value` — the classic lower-bound binary search,
  * as a codegen'd expression.
  *
  * Semantically identical to `size(filter(bounds, b -> b < value))`
  * for a sorted array (duplicates included: the first index with
  * `bounds(i) >= value` IS the count of strictly-smaller elements) —
  * but that spelling runs Spark's interpreted higher-order-function
  * machinery: one lambda dispatch per element per row, O(B) per row
  * with non-codegen overhead. This loop is O(log B) compares inside
  * WholeStageCodegen with zero allocation — the per-row bucket lookup
  * of [[graft.operators.Grids]]' equi-depth mode, where B is a literal
  * 256 and the lookup runs once per INPUT row (corpus-sized at 100 TB).
  *
  * The caller owns the sortedness contract; on an unsorted array the
  * result is unspecified (GridsSpec pins equality against the filter
  * spelling on sorted boundary arrays, duplicates and ties included).
  */
case class SortedLowerBound(left: Expression, right: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), DoubleType)

  override def dataType: DataType = IntegerType

  override def prettyName: String = "sorted_lower_bound"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val v  = b.asInstanceOf[Double]
    var lo = 0
    var hi = xs.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (xs.getDouble(mid) < v) lo = mid + 1 else hi = mid
    }
    lo
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val lo  = ctx.freshName("lo")
      val hi  = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      s"""
         |int $lo = 0;
         |int $hi = $a.numElements();
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($a.getDouble($mid) < $b) { $lo = $mid + 1; } else { $hi = $mid; }
         |}
         |${ev.value} = $lo;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SortedLowerBound =
    copy(left = newLeft, right = newRight)
}

object SortedLowerBound {
  /** Public Column API: #{elements of sorted `bounds` < `value`}. */
  def count(bounds: Column, value: Column): Column =
    ExpressionUtils.column(SortedLowerBound(ExpressionUtils.expression(bounds), ExpressionUtils.expression(value)))
}
