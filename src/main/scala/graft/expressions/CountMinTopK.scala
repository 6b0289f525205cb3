/* Declared inside org.apache.spark.sql (like FloatDot) so the aggregate
 * can be wrapped into a public Column via the classic converters. */
package org.apache.spark.sql.graftx

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable
import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-min-sketch heavy hitters as a custom mergeable aggregate — the
  * one-pass "what are the top-k most frequent values and roughly how
  * often" primitive a 100 TB profiling pass runs where an exact
  * group-by-count would shuffle the full key set.
  *
  * Structure (a [[TypedImperativeAggregate]], the same machinery
  * Spark's own percentile_approx / count_min_sketch use):
  *
  *   - buffer = a d×w count matrix + a bounded candidate key set.
  *     Updates are O(d) array increments — no per-row allocation.
  *   - partial buffers MERGE by adding matrices and unioning candidate
  *     keys; estimates are re-read from the merged matrix, so the
  *     result is independent of partition count and merge order
  *     (asserted by SketchSpec) — the property that makes the sketch
  *     legal as a distributed aggregate.
  *   - eval emits the top-k candidates as array<struct<token,est>>
  *     ordered (est desc, token asc) — a total order, so output is
  *     deterministic.
  *
  * Estimates are upper bounds (min over d rows can only over-count,
  * never under-count); on a small vocabulary the sketch is exact with
  * overwhelming probability, which SketchSpec pins for this corpus.
  * The candidate cap bounds memory when the TRUE key cardinality is
  * huge; overflow keeps the currently-best-estimated keys, which is
  * the standard heavy-hitter heuristic (frequent keys are seen early
  * and often, so they are re-added immediately even if pruned).
  */
case class CountMinTopK(
    child: Expression,
    k: Int,
    w: Int = 1024,
    d: Int = 4,
    maxCandidates: Int = 8192,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[CountMinTopK.Buffer] {

  import CountMinTopK.Buffer

  override def children: Seq[Expression] = child :: Nil

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("token", StringType), StructField("est", LongType))),
    containsNull = false
  )

  override def prettyName: String = "count_min_topk"

  override def createAggregationBuffer(): Buffer =
    new Buffer(new Array[Long](d * w), mutable.HashSet.empty[String])

  private def slot(row: Int, token: String): Int =
    row * w + (MurmurHash3.stringHash(token, row * 0x9e3779b9 + 1) & Int.MaxValue) % w

  private def estimate(buf: Buffer, token: String): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < d) {
      val c = buf.counts(slot(r, token))
      if (c < best) best = c
      r += 1
    }
    best
  }

  private def prune(buf: Buffer): Unit =
    if (buf.cands.size > maxCandidates) {
      val kept = buf.cands.toSeq
        .map(t => (t, estimate(buf, t)))
        .sortBy { case (t, e) => (-e, t) }
        .take(maxCandidates / 2)
        .map(_._1)
      buf.cands.clear()
      buf.cands ++= kept
    }

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val token = v.asInstanceOf[UTF8String].toString
      var r = 0
      while (r < d) { buf.counts(slot(r, token)) += 1; r += 1 }
      buf.cands += token
      prune(buf)
    }
    buf
  }

  override def merge(buf: Buffer, other: Buffer): Buffer = {
    var i = 0
    while (i < buf.counts.length) { buf.counts(i) += other.counts(i); i += 1 }
    buf.cands ++= other.cands
    prune(buf)
    buf
  }

  override def eval(buf: Buffer): Any = {
    val top = buf.cands.toSeq
      .map(t => (t, estimate(buf, t)))
      .sortBy { case (t, e) => (-e, t) }
      .take(k)
    new GenericArrayData(top.map { case (t, e) =>
      InternalRow(UTF8String.fromString(t), e)
    })
  }

  override def serialize(buf: Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.counts.length)
    buf.counts.foreach(out.writeLong)
    out.writeInt(buf.cands.size)
    buf.cands.foreach(out.writeUTF)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val counts = Array.fill(n)(in.readLong())
    val m = in.readInt()
    val cands = mutable.HashSet.empty[String]
    (0 until m).foreach(_ => cands += in.readUTF())
    new Buffer(counts, cands)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinTopK =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): CountMinTopK =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CountMinTopK =
    copy(child = newChildren.head)
}

object CountMinTopK {

  /** Mutable aggregation state: the count matrix + candidate keys. */
  final class Buffer(val counts: Array[Long], val cands: mutable.HashSet[String])

  /** Public Column API: heavy-hitter top-k of a string column. */
  def topk(c: Column, k: Int, w: Int = 1024, d: Int = 4): Column =
    ExpressionUtils.column(
      CountMinTopK(ExpressionUtils.expression(c), k, w, d).toAggregateExpression()
    )
}
