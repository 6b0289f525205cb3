package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact running sums / global ranks over a value-ordered frame WITHOUT a
  * partitionless window over the input — the scale-safe replacement for
  * `Window.orderBy(...)` on a raw (or high-cardinality) table.
  *
  * Decomposition (two-level cumulative sum):
  *   1. one scalar aggregate over the order column — min/max (equal-width)
  *      plus, when `equiDepth`, a `percentile_approx` boundary sketch in the
  *      SAME pass — broadcast back;
  *   2. every row gets a RANGE BUCKET — bucketing is order-consistent
  *      (monotone in v), so all of bucket i sorts before bucket i+1 and ties
  *      in v never straddle a boundary. Equal-width uses
  *      `⌊(v−lo)/(hi−lo)·B⌋` (O(1) arithmetic); equi-depth counts sketch
  *      boundaries strictly below v (O(B) codegen'd array scan, B a literal);
  *   3. per-bucket totals → a ≤B-row table; exclusive prefix sums over it
  *      (the ONLY partitionless window, bounded by the literal B — the
  *      k-bounded class the plan gate whitelists) become per-bucket OFFSETS,
  *      broadcast back;
  *   4. intra-bucket running sums via `Window.partitionBy(bucket)` — a
  *      partitioned, spill-able window; global running sum = offset + local.
  *
  * Results are EXACT under EITHER boundary mode — bucket boundaries affect
  * only partitioning, never the summed values — so DuckDB oracles written
  * against the naive global window stay hash-identical (GridsSpec pins
  * equality against `Window.orderBy` on a high-cardinality synthetic frame,
  * in both modes).
  *
  * 100 TB: the input-sized work is one partial-aggregating groupBy and one
  * PARTITIONED window. Boundary choice governs only bucket-occupancy balance:
  *   - equal-width (default): zero extra cost, but under DISTRIBUTIONAL skew
  *     (values concentrated in a narrow region of the range — e.g. a long
  *     right tail) most rows share one bucket and the partitioned window
  *     degrades toward the global window it replaces;
  *   - `equiDepth = true`: boundaries are the B-quantiles from a
  *     `percentile_approx` sketch folded into the SAME first-pass aggregate,
  *     so occupancy stays ≈N/B per bucket regardless of the value
  *     distribution — the production choice for skewed frames (GridsSpec
  *     asserts bounded occupancy on a pathological frame where equal-width
  *     collapses).
  *   The irreducible case — one EXACT value carrying most rows — maps to one
  *   bucket under any v-functional bucketing (ties must share a bucket for
  *   order consistency); that degenerate frame is pinned by its own spec and
  *   is inherent to the operation, not the boundary mode.
  */
object Grids {

  private val Reserved = Set("_bkt", "_lo", "_hi", "_bnds")

  /** Appends to `df` one running-sum column per `(expr, name)` in `sums`,
    * cumulated in `(v [asc|desc], ties asc...)` order INCLUDING the current
    * row. `v` must be numeric (cast to double only for bucketing) and
    * non-null; `(v, ties)` need not be unique unless per-row determinism of
    * the output requires it (it does for ranks — pass a unique tiebreaker;
    * with a non-unique order, per-row values within a tie group depend on
    * partitioning and may differ across retries).
    */
  def runningSums(
      df: DataFrame,
      v: String,
      desc: Boolean,
      ties: Seq[String],
      sums: Seq[(Column, String)],
      buckets: Int = 256,
      equiDepth: Boolean = false
  ): DataFrame = {
    val inCols   = df.columns.toSeq
    val sumNames = sums.map(_._2)
    // Internal columns are joined back by NAME — reject collisions up front
    // instead of letting Spark raise an ambiguous-reference analysis error
    // (or worse, silently duplicate an output name) deep inside the plan.
    val clash = inCols.filter(c => Reserved(c) || c.startsWith("_t_") || c.startsWith("_o_"))
    require(clash.isEmpty, s"Grids.runningSums: input columns collide with internal names: ${clash.mkString(",")}")
    require(sumNames.distinct == sumNames, s"Grids.runningSums: duplicate sum names: ${sumNames.mkString(",")}")
    val shadow = sumNames.filter(inCols.contains)
    require(shadow.isEmpty, s"Grids.runningSums: sum names shadow input columns: ${shadow.mkString(",")}")
    // Debug-mode enforcement of the ordering contract (ADVICE r8): with a
    // NON-unique (v, ties) order, per-row running values within a tie group
    // depend on partitioning and can differ across retries. Callers that
    // pre-aggregate by v (KS/AUC) are safe with ties = Nil, so the check is
    // OFF by default — set `graft.grids.checkUniqueOrder=true` on the
    // session to pay one countDistinct job per call and fail fast instead.
    // GridsSpec exercises both verdicts.
    if (df.sparkSession.conf.get("graft.grids.checkUniqueOrder", "false").toBoolean) {
      val ordCols = (v +: ties).map(col)
      val Array(n, nd) = df
        .agg(count(lit(1)).as("n"), count_distinct(struct(ordCols: _*)).as("nd"))
        .collect()(0) match { case r => Array(r.getLong(0), r.getLong(1)) }
      require(
        n == nd,
        s"Grids.runningSums: order (${(v +: ties).mkString(", ")}) is not unique " +
          s"($nd distinct of $n rows) — per-row output would be nondeterministic; " +
          "pass a unique tiebreaker in `ties` or pre-aggregate by the order columns"
      )
    }
    val withB     = bucketed(df, v, desc, buckets, equiDepth)
    val totalAggs = sums.map { case (e, n) => sum(e).as(s"_t_$n") }
    val perBucket = withB.groupBy(col("_bkt")).agg(totalAggs.head, totalAggs.tail: _*)
    val wOff      = Window.partitionBy(graft.Det.onePart(col("_bkt"))).orderBy(col("_bkt")).rowsBetween(Window.unboundedPreceding, -1)
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

  /** `df` plus its order-consistent `_bkt` range bucket — step 1+2 of the
    * decomposition, factored out so GridsSpec can assert bucket OCCUPANCY
    * directly (boundedness under equi-depth on skewed frames; the collapse of
    * equal-width on the same frames). Occupancy never affects output values —
    * only the balance of the partitioned intra-bucket window.
    */
  private[graft] def bucketed(
      df: DataFrame,
      v: String,
      desc: Boolean,
      buckets: Int,
      equiDepth: Boolean
  ): DataFrame = {
    val vd = col(v).cast("double")
    val boundAggs =
      Seq(min(col(v)).cast("double").as("_lo"), max(col(v)).cast("double").as("_hi")) ++
        (if (equiDepth)
           Seq(
             // Sketch accuracy sizes the GK summary each row updates.
             // Boundaries steer only bucket OCCUPANCY (output is exact
             // regardless), so the rank error just needs to be small
             // next to a bucket's 1/B share: 8·B gives ε = 1/(8B),
             // i.e. ≤ 12.5 % occupancy skew worst case — there is no
             // reason to pay for more (measured ~3 % end-to-end at
             // sf0.1; the sketch is not the dominant cost either way,
             // but at 100 TB the summary merges across every partition
             // and its size is pure overhead).
             percentile_approx(
               vd,
               array((1 until buckets).map(i => lit(i.toDouble / buckets)): _*),
               lit(8 * buckets)
             ).as("_bnds")
           )
         else Nil)
    val mm   = df.agg(boundAggs.head, boundAggs.tail: _*)
    val span = col("_hi") - col("_lo")
    // Monotone, clamp-safe; hi==lo (or an empty frame's null span) takes the
    // explicit single-bucket branch — ANSI mode forbids even double 0/0.
    val ascB =
      if (equiDepth)
        // #{boundary < v} is monotone in v and constant across ties, and lies
        // in [0, B-1] by construction (≤ B-1 boundaries). A null sketch (empty
        // frame) takes the single-bucket branch like the equal-width path.
        // SortedLowerBound, not size(filter(..)): the quantile boundaries are
        // sorted, so the lookup is an O(log B) codegen'd binary search where
        // the HOF spelling paid B interpreted lambda dispatches per INPUT row.
        when(
          col("_bnds").isNotNull,
          org.apache.spark.sql.graftx.SortedLowerBound.count(col("_bnds"), vd)
        ).otherwise(lit(0))
      else
        when(
          span > 0,
          least(greatest(floor((vd - col("_lo")) / span * buckets), lit(0.0)), lit((buckets - 1).toDouble))
        ).otherwise(lit(0.0)).cast("int")
    val bkt = if (desc) lit(buckets - 1) - ascB else ascB
    df.crossJoin(broadcast(mm)).withColumn("_bkt", bkt).drop("_lo", "_hi", "_bnds")
  }

  /** Global 1-based rank (dense in the unique total order `(v, ties)`) —
    * `runningSums` of the constant 1. */
  def globalRank(
      df: DataFrame,
      v: String,
      desc: Boolean,
      ties: Seq[String],
      rankName: String,
      equiDepth: Boolean = false
  ): DataFrame =
    runningSums(df, v, desc, ties, Seq((lit(1L), rankName)), equiDepth = equiDepth)

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
