package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftx.CountMinTopK
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** Algebraic properties of the count-min heavy-hitter buffer on random
  * streams (scalacheck, no Spark session): the over-count bound, the
  * serialize round-trip, and the merge law (split + merge == single
  * pass) that licenses it as a distributed aggregate.
  */
object CountMinProps extends Properties("CountMinTopK") {

  private def agg = CountMinTopK(BoundReference(0, StringType, nullable = true), k = 50)
  private def row(s: String): InternalRow = InternalRow(UTF8String.fromString(s))

  private val tokens: Gen[List[String]] =
    Gen.listOf(Gen.oneOf((1 to 40).map(i => s"tok$i")))

  private def topOf(a: CountMinTopK, buf: CountMinTopK.Buffer): Seq[(String, Long)] =
    a.eval(buf)
      .asInstanceOf[GenericArrayData]
      .array
      .toSeq
      .map { r =>
        val ir = r.asInstanceOf[InternalRow]
        (ir.getUTF8String(0).toString, ir.getLong(1))
      }

  property("estimates never under-count") = Prop.forAll(tokens) { ts =>
    val a = agg
    val buf = a.createAggregationBuffer()
    ts.foreach(t => a.update(buf, row(t)))
    val exact = ts.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    topOf(a, buf).forall { case (t, est) => est >= exact(t) }
  }

  property("serialize round-trip preserves the result") = Prop.forAll(tokens) { ts =>
    val a = agg
    val buf = a.createAggregationBuffer()
    ts.foreach(t => a.update(buf, row(t)))
    topOf(a, a.deserialize(a.serialize(buf))) == topOf(a, buf)
  }

  property("split + merge == single pass") =
    Prop.forAll(tokens, Gen.choose(0, 1000)) { (ts, cut0) =>
      val cut = if (ts.isEmpty) 0 else cut0 % (ts.size + 1)
      val (l, r) = ts.splitAt(cut)
      val a = agg
      val whole = a.createAggregationBuffer()
      ts.foreach(t => a.update(whole, row(t)))
      val left = a.createAggregationBuffer()
      l.foreach(t => a.update(left, row(t)))
      val right = a.createAggregationBuffer()
      r.foreach(t => a.update(right, row(t)))
      // merge through the wire format, as Spark does between stages
      val merged = a.merge(left, a.deserialize(a.serialize(right)))
      topOf(a, merged) == topOf(a, whole)
    }
}
