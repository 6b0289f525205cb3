package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** The r17 single-job [[operators.StreamEquivalence.verdict]] (grouped
  * counts + null-safe full-outer compare) must agree with the r16
  * reference spelling (2 counts + 2 exceptAll) on EVERY frame pair —
  * it is the backbone of both streaming audit rows, so a silent
  * semantic drift here would mislabel every family verdict. Seeded
  * randomized trials over frames with the hostile value classes the
  * audits actually carry: nulls (scd2's open rows), NaN / -0.0
  * doubles, arrays (signature columns), duplicate rows (multiset
  * semantics), plus targeted mutations (drop / dup / perturb / null
  * a value / swap null to value).
  */
class VerdictSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = true),
    StructField("v", DoubleType, nullable = true),
    StructField("s", StringType, nullable = true),
    StructField("a", ArrayType(LongType, containsNull = true), nullable = true)
  ))

  private def df(rows: Seq[Row]): DataFrame =
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)

  /** The pre-r17 spelling, kept verbatim as the oracle. */
  private def reference(streamed: DataFrame, batch: DataFrame): (Int, Int, Int) = {
    import org.apache.spark.sql.functions.col
    val cols = streamed.columns.toIndexedSeq.map(col)
    val s    = streamed.select(cols: _*)
    val b    = batch.select(cols: _*)
    val sN   = s.count()
    val bN   = b.count()
    val bitEq = sN == bN && s.exceptAll(b).isEmpty && b.exceptAll(s).isEmpty
    (if (sN > 0 && bN > 0) 1 else 0, if (sN == bN) 1 else 0, if (bitEq) 1 else 0)
  }

  private def randRow(r: scala.util.Random): Row = {
    def nl[T](v: => T): Any = if (r.nextInt(5) == 0) null else v
    Row(
      nl(r.nextInt(4).toLong),
      nl(r.nextInt(6) match {
        case 0 => Double.NaN
        case 1 => -0.0
        case 2 => 0.0
        case _ => r.nextInt(3).toDouble
      }),
      nl(s"s${r.nextInt(3)}"),
      nl(Seq.fill(r.nextInt(3))(nl(r.nextInt(3).toLong)))
    )
  }

  private def mutate(rows: Seq[Row], r: scala.util.Random): Seq[Row] =
    r.nextInt(6) match {
      case 0 => rows // identical
      case 1 => r.shuffle(rows) // permuted: multiset-equal
      case 2 if rows.nonEmpty => rows.drop(1) // dropped row
      case 3 if rows.nonEmpty => rows :+ rows.head // duplicated row
      case 4 if rows.nonEmpty => // perturb one value
        rows.updated(0, Row(99L, rows.head.get(1), rows.head.get(2), rows.head.get(3)))
      case 5 if rows.nonEmpty => // null out one value
        rows.updated(0, Row(null, rows.head.get(1), rows.head.get(2), rows.head.get(3)))
      case _ => rows :+ randRow(r)
    }

  test("fused one-job verdict == exceptAll reference on hostile frames (seeded trials)") {
    val r = new scala.util.Random(170817)
    (1 to 30).foreach { i =>
      val base = Seq.fill(r.nextInt(8))(randRow(r))
      val other = mutate(base, r)
      val (sF, bF) = (df(base), df(other))
      val fused = operators.StreamEquivalence.verdict(sF, bF)
      val ref   = reference(sF, bF)
      assert(fused == ref,
        s"trial $i: fused $fused != reference $ref\n base=$base\n other=$other")
    }
  }

  test("empty-vs-empty and empty-vs-nonempty verdicts") {
    val e = df(Nil)
    val n = df(Seq(Row(1L, 1.0, "x", Seq(1L))))
    assert(operators.StreamEquivalence.verdict(e, e) == ((0, 1, 1)))
    assert(operators.StreamEquivalence.verdict(e, n) == reference(e, n))
    assert(operators.StreamEquivalence.verdict(n, e) == reference(n, e))
  }

  test("null-equals-null and NaN-equals-NaN survive the join spelling") {
    val rows = Seq(
      Row(null, Double.NaN, null, Seq(null, 2L)),
      Row(1L, -0.0, "x", null))
    // bit-equal under permutation, exactly like exceptAll
    assert(operators.StreamEquivalence.verdict(df(rows), df(rows.reverse)) == ((1, 1, 1)))
    // 0.0 vs -0.0 normalize equal in BOTH spellings — pin agreement
    val z1 = Seq(Row(1L, 0.0, "x", Seq(1L)))
    val z2 = Seq(Row(1L, -0.0, "x", Seq(1L)))
    assert(operators.StreamEquivalence.verdict(df(z1), df(z2)) ==
      reference(df(z1), df(z2)))
  }
}
