package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeSet, Expression, PredicateHelper, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator custom plan path — preference (c) of the
  * custom-operator ladder: a logical node, a planner [[SparkStrategy]],
  * a two-phase physical operator, and an optimizer [[Rule]], registered
  * via SparkSessionExtensions (see [[graft.GraftExtensions]]).
  *
  * Semantics: keep the first `k` rows of each key group under `order`
  * (a total order — callers supply a tie-break). Output rows are the
  * exact top-k sets; row order within the result is unspecified, like
  * any aggregate.
  *
  * Why a custom operator when TopK.perGroup already plans
  * `WindowGroupLimit`: the window formulation must SORT every map
  * partition (rank is defined by sorted position) before the group
  * limit applies, and sorts again after the shuffle. This operator
  * never sorts — each phase keeps a size-k bounded heap per key, O(n
  * log k) with no sort buffer, and the partial phase shrinks the
  * shuffle to ≤ k rows per key per map partition exactly like a
  * map-side combine. At 100 TB with small k that removes the dominant
  * sort cost from both sides of the exchange.
  *
  * Memory: O(distinct keys in partition × k) rows per task — the same
  * envelope as hash aggregation's in-memory map (pre-spill). Intended
  * for small k (top-N-per-entity); for k approaching group size use
  * the sort-based window path instead.
  */
case class TopKPerKeyNode(keys: Seq[Expression], order: Seq[SortOrder],
                          k: Int, child: LogicalPlan) extends UnaryNode {
  require(k >= 1, s"k must be >= 1, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** Plans the logical node as partial → (exchange) → final: the final
  * phase declares a clustered-on-keys requirement, so EnsureRequirements
  * inserts the hash exchange (and AQE can still coalesce/replan it) —
  * the operator never hand-schedules its own shuffle. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      val partial = TopKPerKeyExec(keys, order, k, planLater(child), partial = true)
      TopKPerKeyExec(keys, order, k, partial, partial = false) :: Nil
    case _ => Nil
  }
}

/** One phase of the bounded-heap top-k: `partial` runs on whatever
  * partitioning the child has; the final phase requires co-location by
  * key, after which the same per-partition pass is exact. Applying the
  * identical operation twice is correct because per-key top-k is an
  * idempotent, associative reduction on row sets. */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                          child: SparkPlan, partial: Boolean) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val childOutput = child.output
    // binds + codegens lazily on first compare, serializes as the
    // SortOrder seq — the TakeOrderedAndProject pattern
    val ordering = new LazilyGeneratedOrdering(order, childOutput)
    val limit = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val worstFirst = ordering.reverse
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](limit, worstFirst)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < limit) heap.add(row.copy())
        else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override def simpleString(maxFields: Int): String =
    s"TopKPerKeyExec(${if (partial) "partial" else "final"}, k=$k, " +
      s"keys=${keys.mkString("[", ", ", "]")})"
}

/** Key-predicate pushdown: a deterministic filter that references only
  * plain-attribute keys is constant within each group, so dropping whole
  * groups commutes with per-group top-k — push it below the node where
  * it can keep descending to the scan. Predicates touching non-key
  * columns must stay above (they would change which rows compete). */
object PushFilterThroughTopKPerKey extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, t: TopKPerKeyNode) =>
      val keyAttrs = AttributeSet(t.keys.collect { case a: Attribute => a })
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(keyAttrs))
      if (push.isEmpty) f
      else {
        val pushed = t.copy(child = Filter(push.reduce(And), t.child))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}
