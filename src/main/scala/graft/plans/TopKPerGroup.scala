/* Declared inside org.apache.spark.sql (like the graftx expressions) so
 * the operator can use the package-private classic bridges
 * (Dataset.ofRows) and spark-internal physical-plan machinery. */
package org.apache.spark.sql.graftx

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  And, Ascending, Attribute, AttributeReference, AttributeSet, Descending, Expression,
  GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow
}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Logical node: the first `k` rows per group under `order`, each row
  * extended with its 1-based rank `rn` (row_number semantics — the
  * caller's ordering must be total, i.e. include a tiebreaker).
  *
  * Why a whole operator instead of `row_number().over(...)` + filter:
  * the window formulation shuffles EVERY row of the child to its group
  * partition and sorts full partitions before the filter throws almost
  * all of it away. This operator prunes map-side first — each input
  * partition keeps at most k rows per group (a bounded heap, no sort),
  * so the shuffle moves ≤ k·|groups| rows instead of |child|. At 100 TB
  * with k=3 that is the difference between shuffling 100 TB and
  * shuffling a few GB. This is (c) on the custom-operator ladder:
  * LogicalPlan + Strategy + SparkPlan, because no composition of
  * built-in operators expresses "partial top-k per group map-side"
  * (groupBy(collect_list + slice) materializes whole groups; window
  * sorts whole partitions).
  */
case class TopKPerGroupNode(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rn: AttributeReference,
    child: LogicalPlan
) extends UnaryNode {
  require(groupExprs.nonEmpty, "TopKPerGroup needs at least one group expression")
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output :+ rn
  // rn is minted by this operator, not consumed from the child —
  // without this, CheckAnalysis flags it as a missing input attribute
  override def producedAttributes: AttributeSet = AttributeSet(rn :: Nil)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

/** Physical node, two-phase like hash aggregation:
  *
  *   partial (map-side): bounded heap per group per input partition —
  *     emits ≤ k rows per (group, partition), no sort, no shuffle.
  *   final: requires ClusteredDistribution(group) — EnsureRequirements
  *     inserts the hash exchange — merges the ≤ k-per-partition
  *     survivors, sorts each tiny group buffer, stamps rn.
  *
  * Memory: one k-row heap per distinct group key per partition (partial)
  * or per group (final) — bounded by k · |groups in partition| rows,
  * the same working set a hash aggregate over the group key holds.
  */
case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rn: AttributeReference,
    partial: Boolean,
    child: SparkPlan
) extends UnaryExecNode {

  override def output: Seq[Attribute] = if (partial) child.output else child.output :+ rn

  override def producedAttributes: AttributeSet =
    if (partial) AttributeSet.empty else AttributeSet(rn :: Nil)

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) super.requiredChildDistribution
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  override def nodeName: String = if (partial) "TopKPerGroupPartial" else "TopKPerGroupFinal"

  // observability at scale: numOutputRows vs the child's row count IS
  // the operator's pruning ratio, and numFlushes > 0 on the partial
  // says the group-cap safety valve engaged (pruning degraded — size
  // spark.graft.topk.maxGroupsPerPartition up if memory allows)
  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numFlushes" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "partial heap flushes")
  )

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupE = groupExprs
    val orderE = order
    val kk = k
    val isPartial = partial
    val rnAttr = rn
    // Memory honesty at 100 TB: the partial's working set is one k-row
    // heap per DISTINCT group per partition. A hash aggregate would
    // spill here; a partial top-k doesn't need to — flushing the heaps
    // downstream and starting over is always correct (the final phase
    // merges), it only costs pruning ratio. This cap bounds partial
    // memory regardless of group cardinality.
    val maxGroups = conf.getConfString("spark.graft.topk.maxGroupsPerPartition", "131072").toInt
    val outRows = longMetric("numOutputRows")
    val flushes = longMetric("numFlushes")
    child.execute().mapPartitionsInternal { iter =>
      import scala.jdk.CollectionConverters._
      val keyProj = UnsafeProjection.create(groupE, childOutput)
      val ord = RowOrdering.create(orderE, childOutput)
      // max-heap under ord: peek() is the WORST row kept, so a new row
      // replaces it iff the new row sorts strictly before it
      val worstFirst: java.util.Comparator[InternalRow] = (a, b) => ord.compare(b, a)
      val heaps = new java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      def insert(row: InternalRow): Unit = {
        val key = keyProj(row)
        var q = heaps.get(key)
        if (q == null) {
          q = new java.util.PriorityQueue[InternalRow](kk, worstFirst)
          heaps.put(key.copy(), q)
        }
        if (q.size() < kk) q.add(row.copy())
        else if (ord.compare(row, q.peek()) < 0) { q.poll(); q.add(row.copy()) }
      }
      if (isPartial) {
        // streaming flush: consume input until the group map hits the
        // cap (or input ends), emit-and-clear, repeat
        new scala.collection.AbstractIterator[InternalRow] {
          private var pending: Iterator[InternalRow] = Iterator.empty
          private def refill(): Unit = {
            while (!pending.hasNext && iter.hasNext) {
              var overflow = false
              while (iter.hasNext && !overflow) {
                insert(iter.next())
                if (heaps.size() > maxGroups) overflow = true
              }
              val snapshot = heaps.values().asScala.toArray
              heaps.clear()
              if (overflow) flushes += 1 // the end-of-input drain is not a cap event
              pending = snapshot.iterator.flatMap(_.iterator().asScala).map { r => outRows += 1; r }
            }
          }
          override def hasNext: Boolean = { refill(); pending.hasNext }
          override def next(): InternalRow = { refill(); pending.next() }
        }
      } else {
        // the final phase must hold every group of its partition at
        // once (k rows each) to merge partials — the same buffer count
        // a hash aggregate keeps; for extreme group cardinality the
        // sort-based window remains the spill-safe alternative
        while (iter.hasNext) insert(iter.next())
        val joined = new JoinedRow
        val out = childOutput :+ rnAttr
        val proj = UnsafeProjection.create(out, out)
        val rnRow = new GenericInternalRow(1)
        heaps.values().iterator().asScala.flatMap { q =>
          val arr = q.toArray(new Array[InternalRow](q.size()))
          java.util.Arrays.sort(arr, ord)
          arr.iterator.zipWithIndex.map { case (r, i) =>
            rnRow.update(0, (i + 1).toLong)
            outRows += 1
            proj(joined(r, rnRow))
          }
        }
      }
    }
  }
}

/** Planner strategy: TopKPerGroupNode → final(partial(child)). */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: TopKPerGroupNode =>
      val partial =
        TopKPerGroupExec(n.groupExprs, n.order, n.k, n.rn, partial = true, planLater(n.child))
      TopKPerGroupExec(n.groupExprs, n.order, n.k, n.rn, partial = false, partial) :: Nil
    case _ => Nil
  }
}

/** Optimizer rule: rewrite the grouped-top-k idiom
  *
  *   Filter(rn <= k, Window(row_number() as rn OVER (PARTITION BY p ORDER BY o), child))
  *
  * into TopKPerGroupNode — users keep writing the standard window
  * formulation and the planner swaps in the bounded-heap operator
  * (map-side pruning instead of a full shuffle-and-sort). Guarded
  * narrowly: exactly one window expression, it is row_number() (rank/
  * dense_rank admit >k rows per group; other functions aren't limits),
  * both partition and order specs non-empty, and the filter bounds rn
  * by a positive integer literal. Spark's own InferWindowGroupLimit
  * fires on the same shape first and leaves a WindowGroupLimit below
  * the Window — it is subsumed and stripped. Conjuncts other than the
  * rn bound survive as a residual Filter; the rewritten plan reproduces
  * rn (cast back to the window function's int type) under the original
  * exprId, so downstream references are untouched.
  */
object WindowTopKRewrite
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.{
    Alias, Cast, EqualTo, IntegerLiteral, LessThan, LessThanOrEqual, Literal, RowNumber,
    WindowExpression
  }
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project, Window, WindowGroupLimit}
  import org.apache.spark.sql.catalyst.expressions.SpecifiedWindowFrame
  import org.apache.spark.sql.catalyst.expressions.{CurrentRow, RowFrame, UnboundedPreceding}
  import org.apache.spark.sql.types.IntegerType

  /** The rn attribute, possibly wrapped in the widening cast that
    * predicate pushdown substitutes when the user wrote
    * `row_number().cast("long")` — injective and monotonic, so bounds
    * transfer unchanged. */
  private def isRn(e: Expression, rn: Attribute): Boolean = e match {
    case a: Attribute            => a.semanticEquals(rn)
    case Cast(c, LongType, _, _) => isRn(c, rn)
    case _                       => false
  }

  private object IntBound {
    def unapply(e: Expression): Option[Int] = e match {
      case IntegerLiteral(k)                                               => Some(k)
      case Literal(k: Long, LongType) if k >= Int.MinValue && k <= Int.MaxValue => Some(k.toInt)
      case _                                                               => None
    }
  }

  /** (bound, droppable): `rn <= k` and `rn < k+1` are fully enforced by
    * top-k and can be dropped; `rn = n` bounds state at n but must stay
    * as a residual equality filter. */
  private def bound(e: Expression, rn: Attribute): Option[(Int, Boolean)] = e match {
    case LessThanOrEqual(a, IntBound(k)) if isRn(a, rn) => Some((k, true))
    case LessThan(a, IntBound(k)) if isRn(a, rn)        => Some((k - 1, true))
    case EqualTo(a, IntBound(k)) if isRn(a, rn)         => Some((k, false))
    case EqualTo(IntBound(k), a) if isRn(a, rn)         => Some((k, false))
    case _                                              => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(
          cond,
          Window(
            Seq(alias @ Alias(WindowExpression(RowNumber(), spec), _)),
            part,
            order,
            wChild,
            _
          )) if part.nonEmpty && order.nonEmpty &&
      (spec.frameSpecification match {
        case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) => true
        case _                                                              => false
      }) =>
      val rnAttr = alias.toAttribute
      val conjuncts = splitConjunctivePredicates(cond)
      val bounds = conjuncts.map(c => c -> bound(c, rnAttr))
      val ks = bounds.collect { case (_, Some((k, _))) => k }
      // any conjunct that still references rn but is not a recognized
      // bound (rn > 2, rn % 2 = 0, ...) keeps full window semantics —
      // don't rewrite
      val unrecognizedRn = bounds.exists { case (c, b) => b.isEmpty && c.references.contains(rnAttr) }
      if (ks.isEmpty || ks.min < 1 || unrecognizedRn) f
      else {
        val k = ks.min
        val residual = bounds.collect {
          case (c, None)             => c
          case (c, Some((_, false))) => c
        }
        // InferWindowGroupLimit already fired on this shape: its
        // partial limit is subsumed by the top-k operator
        val child = wChild match {
          case WindowGroupLimit(_, _, _, _, inner) => inner
          case other                               => other
        }
        val rnLong = AttributeReference(alias.name, LongType, nullable = false)()
        val topk = TopKPerGroupNode(part, order, k, rnLong, child)
        val restored = Project(
          child.output :+ Alias(Cast(rnLong, IntegerType), alias.name)(exprId = rnAttr.exprId),
          topk
        )
        if (residual.isEmpty) restored else Filter(residual.reduce(And), restored)
      }
  }
}

/** Public entry points. */
object TopKPerGroup {

  /** Idempotently add the planner strategy AND the window-top-k
    * rewrite to an existing session — the runtime-registration path
    * for sessions the caller didn't build (the driver's Verify/Bench
    * sessions). Cluster deployments can instead set
    * `spark.sql.extensions=graft.GraftExtensions`. The two must
    * register together: the rule plants TopKPerGroupNode, the strategy
    * is what can plan it. */
  def register(spark: SparkSession): Unit = synchronized {
    val em = spark.experimental
    if (!em.extraStrategies.contains(TopKPerGroupStrategy)) {
      em.extraStrategies = em.extraStrategies :+ TopKPerGroupStrategy
    }
    if (!em.extraOptimizations.contains(WindowTopKRewrite)) {
      em.extraOptimizations = em.extraOptimizations :+ WindowTopKRewrite
    }
  }

  /** Top-k rows per group. `orderSpec` is (column, descending?) pairs
    * and MUST be a total order (include a tiebreaker) for deterministic
    * output; the result carries the child's columns plus a 1-based
    * `rn` rank column (row_number semantics).
    */
  def apply(
      df: DataFrame,
      groupCols: Seq[String],
      orderSpec: Seq[(String, Boolean)],
      k: Int,
      rnName: String = "rn"
  ): DataFrame = {
    val cdf = df.asInstanceOf[ClassicDataset[Row]]
    val spark = cdf.sparkSession
    register(spark)
    val lp = cdf.queryExecution.analyzed
    // Resolve with the session's resolver (case-insensitive by default)
    // and refuse ambiguity: after a join a DataFrame can carry duplicate
    // column names, and silently binding the first would rank by the
    // wrong side's column.
    val resolver = spark.sessionState.analyzer.resolver
    def attr(n: String): Attribute = lp.output.filter(a => resolver(a.name, n)) match {
      case collection.Seq(one) => one
      case collection.Seq() =>
        throw new IllegalArgumentException(
          s"column '$n' not in ${lp.output.map(_.name).mkString(", ")}")
      case many =>
        throw new IllegalArgumentException(
          s"column '$n' is ambiguous: ${many.size} attributes match " +
            s"(${many.map(_.qualifiedName).mkString(", ")}) — disambiguate before TopKPerGroup")
    }
    val group = groupCols.map(attr)
    val order = orderSpec.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    val rnAttr = AttributeReference(rnName, LongType, nullable = false)()
    ClassicDataset.ofRows(spark, TopKPerGroupNode(group, order, k, rnAttr, lp))
  }
}
