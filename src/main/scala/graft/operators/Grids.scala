package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact running sums / global ranks over a value-ordered frame WITHOUT a
  * partitionless window over the input — the scale-safe replacement for
  * `Window.orderBy(...)` on a raw (or high-cardinality) table.
  *
  * Decomposition (two-level cumulative sum):
  *   1. one scalar min/max aggregate over the order column, broadcast back;
  *   2. every row gets a RANGE BUCKET `⌊(v−lo)/(hi−lo)·B⌋` — bucketing is
  *      order-consistent (monotone in v), so all of bucket i sorts before
  *      bucket i+1 and ties in v never straddle a boundary;
  *   3. per-bucket totals → a ≤B-row table; exclusive prefix sums over it
  *      (the ONLY partitionless window, bounded by the literal B — the
  *      k-bounded class the plan gate whitelists) become per-bucket OFFSETS,
  *      broadcast back;
  *   4. intra-bucket running sums via `Window.partitionBy(bucket)` — a
  *      partitioned, spill-able window; global running sum = offset + local.
  *
  * Results are EXACT — bucket boundaries affect only partitioning, never the
  * summed values — so DuckDB oracles written against the naive global window
  * stay hash-identical (GridsSpec pins equality against `Window.orderBy` on a
  * high-cardinality synthetic frame).
  *
  * 100 TB: the input-sized work is one partial-aggregating groupBy and one
  * PARTITIONED window; the worst skew case (every row one value) degrades to
  * a single bucket == the global window it replaces, and real drift there is
  * handled the same way production systems do — equi-depth boundaries from a
  * quantile sketch instead of equal-width; the decomposition is unchanged.
  * Equal-width is used here because it needs no second pass and determinism
  * of the OUTPUT never depends on the boundary choice.
  */
object Grids {

  /** Appends to `df` one running-sum column per `(expr, name)` in `sums`,
    * cumulated in `(v [asc|desc], ties asc...)` order INCLUDING the current
    * row. `v` must be numeric (cast to double only for bucketing) and
    * non-null; `(v, ties)` need not be unique unless per-row determinism of
    * the output requires it (it does for ranks — pass a unique tiebreaker).
    */
  def runningSums(
      df: DataFrame,
      v: String,
      desc: Boolean,
      ties: Seq[String],
      sums: Seq[(Column, String)],
      buckets: Int = 256
  ): DataFrame = {
    val inCols = df.columns.toSeq
    val mm = df.agg(min(col(v)).cast("double").as("_lo"), max(col(v)).cast("double").as("_hi"))
    val vd   = col(v).cast("double")
    val span = col("_hi") - col("_lo")
    // Monotone, clamp-safe; hi==lo (or an empty frame's null span) takes the
    // explicit single-bucket branch — ANSI mode forbids even double 0/0.
    val ascB =
      when(span > 0, least(greatest(floor((vd - col("_lo")) / span * buckets), lit(0.0)), lit((buckets - 1).toDouble)))
        .otherwise(lit(0.0))
        .cast("int")
    val bkt       = if (desc) lit(buckets - 1) - ascB else ascB
    val withB     = df.crossJoin(broadcast(mm)).withColumn("_bkt", bkt).drop("_lo", "_hi")
    val totalAggs = sums.map { case (e, n) => sum(e).as(s"_t_$n") }
    val perBucket = withB.groupBy(col("_bkt")).agg(totalAggs.head, totalAggs.tail: _*)
    val wOff      = Window.orderBy(col("_bkt")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perBucket.select(
      col("_bkt") +: sums.map { case (_, n) =>
        coalesce(sum(col(s"_t_$n")).over(wOff), lit(0L)).as(s"_o_$n")
      }: _*
    )
    val ord = (if (desc) col(v).desc else col(v).asc) +: ties.map(col(_).asc)
    val wIn =
      Window.partitionBy(col("_bkt")).orderBy(ord: _*).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withB
      .join(broadcast(offsets), Seq("_bkt"))
      .select(inCols.map(col) ++ sums.map { case (e, n) => (col(s"_o_$n") + sum(e).over(wIn)).as(n) }: _*)
  }

  /** Global 1-based rank (dense in the unique total order `(v, ties)`) —
    * `runningSums` of the constant 1. */
  def globalRank(df: DataFrame, v: String, desc: Boolean, ties: Seq[String], rankName: String): DataFrame =
    runningSums(df, v, desc, ties, Seq((lit(1L), rankName)))

  /** `ntile(n)`-identical bucket from a 1-based global rank and the exact
    * total row count: buckets 1..(N mod n) get ⌈N/n⌉ rows, the rest ⌊N/n⌋ —
    * the SQL-standard rule, computed arithmetically so no global-order window
    * is ever planned. `nTotal` must be the exact COUNT(*) of the ranked frame
    * (broadcast it as a scalar).
    */
  def ntileFromRank(rank: Column, nTotal: Column, n: Int): Column = {
    // Integer division via exact double floor: every operand here is a
    // non-negative count < 2^53, where IEEE division + floor is exact.
    def idiv(a: Column, b: Column): Column = floor(a.cast("double") / b.cast("double")).cast("long")
    val r0   = rank - lit(1L)
    val base = idiv(nTotal.cast("long"), lit(n.toLong)) // ⌊N/n⌋
    val rem  = nTotal.cast("long") % lit(n.toLong)      // N mod n
    val big  = base + lit(1L)                           // ⌈N/n⌉ when rem > 0
    val cut  = big * rem
    // greatest(base,1): the otherwise-branch is unreachable when base = 0
    // (N < n ⇒ rem = N ⇒ r0 < cut always), but division by zero must stay
    // impossible in the expression itself.
    when(r0 < cut, idiv(r0, big) + lit(1L))
      .otherwise(rem + idiv(r0 - cut, greatest(base, lit(1L))) + lit(1L))
  }
}
