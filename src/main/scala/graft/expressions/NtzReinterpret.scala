/* Declared inside org.apache.spark.sql for the same reason as
 * FloatDot: wrapping a catalyst Expression into a public Column uses
 * the package-private classic converters. */
package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, TimestampNTZType}

/** Reinterpret TIMESTAMP_NTZ ↔ its physical long — the zero-cost,
  * session-zone-proof spelling of naive epoch micros.
  *
  * Spark stores `TimestampNTZType` as a long of microseconds since
  * 1970-01-01 00:00:00 in the NAIVE (zone-less) calendar — i.e. the
  * exact value `Det.ntzMicros`'s field arithmetic reconstructs. These
  * expressions just relabel the type: `nullSafeEval` is the identity
  * and `doGenCode` emits the input variable — no conversion code at
  * all, so the per-row cost is zero and no session time zone can ever
  * be consulted (the built-in `unix_micros(cast(ntz as timestamp))`
  * routes through an NTZ→instant conversion in the session zone;
  * `date_trunc` likewise — both probed wrong across a DST gap).
  * TzRobustnessSpec pins reinterpret ≡ field arithmetic on the real
  * events data under UTC and America/New_York.
  */
case class NtzEpochMicros(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(TimestampNTZType)
  override def dataType: DataType               = LongType
  override def prettyName: String               = "ntz_epoch_micros"

  override protected def nullSafeEval(input: Any): Any = input

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => c)

  override protected def withNewChildInternal(newChild: Expression): NtzEpochMicros =
    copy(child = newChild)
}

/** Inverse of [[NtzEpochMicros]]: naive epoch micros → TIMESTAMP_NTZ. */
case class MicrosToNtz(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType               = TimestampNTZType
  override def prettyName: String               = "micros_to_ntz"

  override protected def nullSafeEval(input: Any): Any = input

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => c)

  override protected def withNewChildInternal(newChild: Expression): MicrosToNtz =
    copy(child = newChild)
}

object NtzReinterpret {
  def micros(c: Column): Column =
    ExpressionUtils.column(NtzEpochMicros(ExpressionUtils.expression(c)))
  def ntz(c: Column): Column =
    ExpressionUtils.column(MicrosToNtz(ExpressionUtils.expression(c)))
}
