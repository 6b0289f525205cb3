/* Declared inside org.apache.spark.sql so the expression can be wrapped
 * into a public Column via the (package-private) classic converters —
 * the standard packaging for third-party native expressions. */
package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Row-level runtime-filter probe: `might_contain(bloomBytes, key)` over
  * a long key, where `bloomBytes` is a foldable binary column holding a
  * serialized `org.apache.spark.util.sketch.BloomFilter`.
  *
  * This is the engine's explicit spelling of runtime bloom-filter join
  * pruning (the row-level cousin of dynamic partition pruning): build a
  * bloom filter over the join keys of a SELECTIVE dimension subset (one
  * pass over the small side), embed it in the plan as a binary literal,
  * and drop fact rows that cannot match BEFORE they reach the join's
  * exchange. No false negatives — the join afterwards removes the false
  * positives, so results are exact; the filter only shrinks the shuffled
  * volume (at fpp 1 % a 97 %-selective dim predicate cuts the fact-side
  * exchange by ~30× — see `join_bloom_prune`).
  *
  * The filter is deserialized ONCE per executor (transient lazy) and the
  * generated code probes it directly via [[BloomFilter.mightContainLong]]
  * — the probe stays inside WholeStageCodegen next to the scan, so the
  * pruning happens in the same fused loop that reads the parquet column.
  *
  * 100 TB: the build side is a driver-visible aggregate of the SMALL
  * side only (same contract as Spark's own InjectRuntimeFilter, which
  * plans it as a bloom aggregate subquery); the probe side — the 100 TB
  * fact — is touched exactly once, map-side, with zero extra shuffle.
  */
case class LongBloomMightContain(bloomBytes: Expression, value: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  override def left: Expression = bloomBytes
  override def right: Expression = value

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "long_bloom_might_contain"

  // the bloom side must be constant: it is evaluated once per executor,
  // not per row (a per-row bloom would silently probe a stale filter).
  // Surfaced as a type-check failure, not a require(): a non-foldable
  // first argument to the SQL-registered function then raises a normal
  // AnalysisException instead of a raw IllegalArgumentException.
  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (!bloomBytes.foldable)
      TypeCheckResult.TypeCheckFailure(
        "long_bloom_might_contain: bloom bytes must be a foldable (constant) binary value, " +
          "since the filter is deserialized once per executor, not per row")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val bloom: BloomFilter = {
    val bytes = bloomBytes.eval(InternalRow.empty).asInstanceOf[Array[Byte]]
    require(bytes != null, "long_bloom_might_contain: bloom bytes literal is null")
    BloomFilter.readFrom(bytes)
  }

  override def eval(input: InternalRow): Any = {
    val v = value.eval(input)
    if (v == null) null else bloom.mightContainLong(v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference the deserialized filter object, not the bytes: the probe
    // is then one virtual call per row with no per-row deserialization
    val bloomRef = ctx.addReferenceObj("graftBloom", bloom, classOf[BloomFilter].getName)
    val valueGen = value.genCode(ctx)
    ev.copy(code = code"""
      ${valueGen.code}
      boolean ${ev.isNull} = ${valueGen.isNull};
      boolean ${ev.value} = false;
      if (!${ev.isNull}) {
        ${ev.value} = $bloomRef.mightContainLong(${valueGen.value});
      }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): LongBloomMightContain =
    copy(bloomBytes = newLeft, value = newRight)
}

object LongBloomMightContain {
  /** Serialize a built filter for embedding as a plan literal. */
  def serialize(bf: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Public Column API: probe `key` against a serialized bloom literal. */
  def probe(bloomBytes: Array[Byte], key: Column): Column =
    ExpressionUtils.column(
      LongBloomMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal.create(bloomBytes, BinaryType),
        ExpressionUtils.expression(key)
      )
    )
}
