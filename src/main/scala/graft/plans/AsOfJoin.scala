/* Declared inside org.apache.spark.sql (like TopKPerGroup) so the
 * operator can use the package-private classic bridges (Dataset.ofRows)
 * and spark-internal physical-plan machinery. */
package org.apache.spark.sql.graftx

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Ascending, Attribute, AttributeReference, AttributeSet, BindReferences, Descending,
  Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection
}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Logical node: backward as-of join. For every left row, the LATEST
  * right row of the same key with rightTime ≤ leftTime (inclusive, the
  * DuckDB `ASOF ... ON l.t >= r.t` comparator); unmatched left rows
  * carry nulls (left-outer semantics). `matched` are the operator's
  * output attributes for the carried right-side values, `rightValues`
  * the parallel expressions over the right child.
  *
  * Why a whole operator instead of the union-window trick
  * ([[graft.operators.Joins]] `join_asof`): the window formulation
  * UNIONs both sides into one stream, shuffles and sorts
  * |left| + |right| rows, then filters the left tag back out — every
  * right row is shuffled wearing the full padded union schema, and the
  * per-partition sort covers both sides. This operator shuffles each
  * side once in its OWN schema (exactly the shuffle a sort-merge join
  * would pay), sorts each side by (key, time), and resolves matches
  * with an O(|left| + |right|) forward-only merge scan holding ONE
  * candidate row of state. No range-join blowup, no padded union, no
  * post-filter. This is (c) on the custom-operator ladder — no
  * built-in composition expresses "co-partitioned ordered merge with
  * last-at-or-before semantics" without materializing the union or a
  * range join.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    matched: Seq[AttributeReference],
    rightValues: Seq[Expression],
    forward: Boolean,
    toleranceUs: Option[Long]
) extends BinaryNode {
  require(matched.length == rightValues.length, "matched/rightValues must be parallel")
  override def output: Seq[Attribute] = left.output ++ matched
  override def producedAttributes: AttributeSet = AttributeSet(matched)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan,
      newRight: LogicalPlan
  ): AsOfJoinNode = copy(left = newLeft, right = newRight)
}

/** Physical node. Both children are required ClusteredDistribution on
  * their key (EnsureRequirements inserts co-partitioned hash
  * exchanges, exactly like a sort-merge join) and sorted by
  * (key, time). Each partition pair then merges in one forward pass:
  * right rows are consumed while they sort at-or-before the current
  * left row, the last same-key survivor is the candidate, and a key
  * change invalidates it. State = one projected candidate row.
  *
  * At 100 TB this is the as-of plan you want: shuffle each side once
  * on the key, no union padding, no per-row window state, and the
  * merge is a single cache-friendly scan per partition.
  */
case class AsOfJoinExec(
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    matched: Seq[AttributeReference],
    rightValues: Seq[Expression],
    forward: Boolean,
    toleranceUs: Option[Long],
    left: SparkPlan,
    right: SparkPlan
) extends BinaryExecNode {
  require(
    toleranceUs.isEmpty || leftTime.dataType.isInstanceOf[org.apache.spark.sql.types.TimestampNTZType] ||
      leftTime.dataType.isInstanceOf[org.apache.spark.sql.types.TimestampType] ||
      leftTime.dataType.isInstanceOf[org.apache.spark.sql.types.LongType],
    "tolerance needs a micros-backed time column (timestamp or long)"
  )

  override def output: Seq[Attribute] = left.output ++ matched

  override def producedAttributes: AttributeSet = AttributeSet(matched)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  // forward direction ("earliest at-or-after") is the SAME merge on
  // time-REVERSED streams: sort time descending and flip the time
  // comparator — the last right row consumed at-or-"before" in
  // reversed order is the smallest rt >= lt
  private def timeDir = if (forward) Descending else Ascending

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, timeDir)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, timeDir))
    )

  // the merge emits left rows in their incoming order
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan,
      newRight: SparkPlan
  ): AsOfJoinExec = copy(left = newLeft, right = newRight)

  override def nodeName: String = "AsOfJoinMerge"

  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatched" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "left rows with a match")
  )

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = BindReferences.bindReference(leftKey, lOut)
    val lt = BindReferences.bindReference(leftTime, lOut)
    val rk = BindReferences.bindReference(rightKey, rOut)
    val rt = BindReferences.bindReference(rightTime, rOut)
    val rVals = rightValues
    val outAttrs = output
    val nMatched = matched.length
    val outRows = longMetric("numOutputRows")
    val matchedRows = longMetric("numMatched")
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    // backward: consume right while rt <= lt; forward (time-reversed
    // streams): consume while rt >= lt — one sign flip
    val dirSign = if (forward) -1 else 1
    val tolUs = toleranceUs
    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val matchedProj = UnsafeProjection.create(rVals, rOut)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullRow = new GenericInternalRow(nMatched)
      val rBuf = ri.buffered
      // candidate = matched-values of the last right row consumed whose
      // key equals candKey; stale once the left key moves past it
      var candKey: Any = null
      var cand: InternalRow = null
      var candTime: Long = 0L
      val tol = tolUs.getOrElse(Long.MaxValue)
      li.map { l =>
        val lkv = lk.eval(l)
        val ltv = lt.eval(l)
        if (lkv != null && ltv != null) {
          var advance = true
          while (advance && rBuf.hasNext) {
            val head = rBuf.head
            val rkv = rk.eval(head)
            val rtv = rt.eval(head)
            if (rkv == null || rtv == null) { rBuf.next() } // null keys/times never match
            else {
              val kc = keyOrd.compare(rkv, lkv)
              if (kc < 0) { rBuf.next(); cand = null; candKey = null }
              else if (kc == 0 && dirSign * timeOrd.compare(rtv, ltv) <= 0) {
                candTime = rtv match { case x: java.lang.Long => x.longValue(); case _ => 0L }
                cand = matchedProj(rBuf.next()).copy()
                candKey = rkv
              } else advance = false
            }
          }
        }
        // tolerance: the (unique) as-of match still loses if it sits
        // further than the gap budget — pandas merge_asof semantics
        def inTol: Boolean = tolUs.isEmpty || (ltv match {
          case x: java.lang.Long => dirSign.toLong * (x.longValue() - candTime) <= tol
          case _                 => true
        })
        val hit = cand != null && lkv != null && keyOrd.compare(candKey, lkv) == 0 && inTol
        if (hit) matchedRows += 1
        outRows += 1
        resultProj(joined(l, if (hit) cand else nullRow))
      }
    }
  }
}

/** Planner strategy: AsOfJoinNode → AsOfJoinExec. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(
        n.leftKey, n.rightKey, n.leftTime, n.rightTime,
        n.matched, n.rightValues, n.forward, n.toleranceUs,
        planLater(n.left), planLater(n.right)
      ) :: Nil
    case _ => Nil
  }
}

/** Public entry point. */
object AsOfJoinNative {

  /** Idempotently add the planner strategy to an existing session. */
  def register(spark: SparkSession): Unit = synchronized {
    val em = spark.experimental
    if (!em.extraStrategies.contains(AsOfJoinStrategy)) {
      em.extraStrategies = em.extraStrategies :+ AsOfJoinStrategy
    }
  }

  /** Backward as-of join: for each `left` row, the latest `right` row
    * with `right(rightTimeCol) <= left(leftTimeCol)` on the same
    * `keyCol`, left-outer. `carried` maps output column names to right
    * columns; equal-time right ties are resolved by their (key, time)
    * sort, so carry only columns whose value is unambiguous under
    * time ties (e.g. the time itself) or pre-deduplicate the right
    * side. The right side is re-aliased through a fresh projection, so
    * self-joins (left and right filtered from the same source) are
    * safe — no duplicate attribute ids across children.
    */
  def apply(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTimeCol: String,
      rightTimeCol: String,
      carried: Seq[(String, String)],
      forward: Boolean = false,
      toleranceUs: Option[Long] = None
  ): DataFrame = {
    val cdf = left.asInstanceOf[ClassicDataset[Row]]
    val spark = cdf.sparkSession
    register(spark)
    val lp = cdf.queryExecution.analyzed
    val rp = right.asInstanceOf[ClassicDataset[Row]].queryExecution.analyzed
    val resolver = spark.sessionState.analyzer.resolver
    def attr(plan: LogicalPlan, n: String): Attribute =
      plan.output.filter(a => resolver(a.name, n)) match {
        case collection.Seq(one) => one
        case collection.Seq() =>
          throw new IllegalArgumentException(
            s"column '$n' not in ${plan.output.map(_.name).mkString(", ")}")
        case many =>
          throw new IllegalArgumentException(
            s"column '$n' is ambiguous (${many.size} matches) — disambiguate first")
      }
    // fresh aliases on every consumed right column → children never
    // share attribute ids even when left and right are the same table
    val rKeyAlias = Alias(attr(rp, keyCol), s"__asof_k")()
    val rTimeAlias = Alias(attr(rp, rightTimeCol), s"__asof_t")()
    val carryAliases = carried.map { case (out, in) => Alias(attr(rp, in), s"__asof_$out")() }
    val rProj = Project(rKeyAlias +: rTimeAlias +: carryAliases, rp)
    val matched = carried.zip(carryAliases).map { case ((out, _), a) =>
      AttributeReference(out, a.dataType, nullable = true)()
    }
    val node = AsOfJoinNode(
      lp,
      rProj,
      attr(lp, keyCol),
      rKeyAlias.toAttribute,
      attr(lp, leftTimeCol),
      rTimeAlias.toAttribute,
      matched,
      carryAliases.map(_.toAttribute),
      forward,
      toleranceUs
    )
    ClassicDataset.ofRows(spark, node)
  }
}
