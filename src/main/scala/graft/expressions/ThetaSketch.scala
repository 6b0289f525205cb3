/* Declared inside org.apache.spark.sql (like FloatDot/CountMinTopK) so
 * the aggregate can be wrapped into a public Column via the classic
 * converters. */
package org.apache.spark.sql.graftx

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketch, Sketches, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Theta sketch of a LONG key column (Datasketches) — the distinct-set
  * sketch that, unlike HLL, supports SET OPERATIONS on the sketches
  * themselves: union AND intersection. That is the 100 TB corpus-
  * overlap primitive: sketch each source/day/segment once, then answer
  * "how many users/docs do X and Y share" from kilobytes, never
  * re-joining the data.
  *
  * Mergeability and order-independence come from the theta structure
  * itself (a hash-threshold sample of the key set with a fixed seed):
  * the same key set yields the same sketch whatever the partitioning,
  * so this is a legal distributed aggregate. Below ~4k distinct keys
  * (lgK=12) the sketch retains EVERY hash and estimates are exact —
  * which is what lets the overlap query be oracle-checked at test
  * scale; beyond that it degrades to the standard ±ε estimate.
  */
case class ThetaSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Union] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_sketch_agg"

  override def createAggregationBuffer(): Union = SetOperation.builder().buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult())
    buf
  }

  override def eval(buf: Union): Any = buf.getResult().toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult().toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().buildUnion()
    u.union(Sketches.wrapCompactSketch(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = newChildren.head)
}

/** Scalar set-operation estimates over two serialized theta sketches.
  * Tiny-cardinality path (pairs of grouped sketches), so a
  * CodegenFallback eval is the right cost/complexity trade — the hot
  * path is the aggregate above, not this closer. */
case class ThetaPairEstimate(left: Expression, right: Expression, op: String)
    extends BinaryExpression
    with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = s"theta_${op}_estimate"

  private def wrap(v: Any): Sketch =
    Sketches.wrapCompactSketch(Memory.wrap(v.asInstanceOf[Array[Byte]]))

  override protected def nullSafeEval(a: Any, b: Any): Any = op match {
    case "intersect" =>
      val i = SetOperation.builder().buildIntersection()
      i.intersect(wrap(a)); i.intersect(wrap(b))
      i.getResult().getEstimate
    case "union" =>
      val u = SetOperation.builder().buildUnion()
      u.union(wrap(a)); u.union(wrap(b))
      u.getResult().getEstimate
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaPairEstimate =
    copy(left = l, right = r)
}

object ThetaSketchAgg {

  /** Aggregate: theta sketch (binary) of a long key column. */
  def sketch(c: Column): Column =
    ExpressionUtils.column(
      ThetaSketchAgg(ExpressionUtils.expression(c)).toAggregateExpression()
    )

  /** Scalar: distinct estimate of one serialized sketch. */
  def estimate(c: Column): Column = pairEstimate(c, c, "union")

  /** Scalar: estimated |A ∩ B| / |A ∪ B| inputs from two sketches. */
  def pairEstimate(a: Column, b: Column, op: String): Column =
    ExpressionUtils.column(
      ThetaPairEstimate(ExpressionUtils.expression(a), ExpressionUtils.expression(b), op)
    )
}
