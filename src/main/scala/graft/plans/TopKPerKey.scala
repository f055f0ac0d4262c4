package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeSet, Expression, PredicateHelper, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

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
  * Memory: the partial phase's per-partition heap map is BOUNDED at
  * `spark.graft.topk.maxKeysInMemory` keys (default 262144 ≈ a few
  * hundred MB worst case at small k): past the bound it flushes — emits
  * every held heap and starts a fresh map — which is safe because the
  * final phase re-reduces whatever reaches it (per-key top-k is an
  * idempotent, associative reduction on row sets). Hostile key
  * cardinality therefore degrades to a larger shuffle, never an OOM —
  * the hash-aggregation spill posture, traded for extra shuffle rows
  * instead of disk. The final phase holds (distinct keys in its
  * clustered partition) × k rows — already reduced by the partial
  * phase and divided by the shuffle fan-out; for k approaching group
  * size use the sort-based window path instead.
  *
  * `localGroups = true` is the caller-certified shortcut for the
  * assignment shape (a cross join against a BROADCAST table, grouped by
  * the STREAM side's unique row id): every key's rows are then emitted
  * consecutively within one partition, so a single bounded-heap pass is
  * already exact and the plan drops BOTH the key exchange and the final
  * phase — at corpus scale that deletes a corpus-wide shuffle carrying
  * the full vector payload. The flush bound stays safe because a run
  * boundary can only fall BETWEEN contiguous key runs, never inside
  * one. The contract is the caller's to uphold (contiguous keys, one
  * partition per key — broadcast-cross-join output satisfies both; AQE
  * partition coalescing concatenates whole partitions and preserves
  * it). A violation silently yields more than k rows for a split key.
  */
case class TopKPerKeyNode(keys: Seq[Expression], order: Seq[SortOrder],
                          k: Int, child: LogicalPlan,
                          localGroups: Boolean = false) extends UnaryNode {
  require(k >= 1, s"k must be >= 1, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** Plans the logical node as partial → (exchange) → final: the final
  * phase declares a clustered-on-keys requirement, so EnsureRequirements
  * inserts the hash exchange (and AQE can still coalesce/replan it) —
  * the operator never hand-schedules its own shuffle.
  *
  * Float/double group keys are wrapped in the optimizer's
  * NormalizeNaNAndZero here (Spark's NormalizeFloatingNumbers rule only
  * fires for Aggregate/Window/Join, not custom nodes): without it,
  * -0.0 vs 0.0 and distinct NaN bit patterns would land in different
  * UnsafeRow key bytes — splitting one logical group across heaps and
  * hash partitions, diverging from the window formulation.
  */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child, localGroups) =>
      val nkeys =
        keys.map(org.apache.spark.sql.graftbridge.ExprBridge.normalizeFloats)
      if (localGroups) {
        // caller-certified contiguous groups: one bounded-heap pass is
        // exact, no exchange, no final phase (see node scaladoc)
        TopKPerKeyExec(nkeys, order, k, planLater(child),
          partial = true, localGroups = true) :: Nil
      } else {
        val partial = TopKPerKeyExec(nkeys, order, k, planLater(child), partial = true)
        TopKPerKeyExec(nkeys, order, k, partial, partial = false) :: Nil
      }
    case _ => Nil
  }
}

/** One phase of the bounded-heap top-k: `partial` runs on whatever
  * partitioning the child has (flushing at the key bound — see node
  * scaladoc); the final phase requires co-location by key, after which
  * one per-partition pass is exact. Applying the identical operation
  * twice is correct because per-key top-k is an idempotent, associative
  * reduction on row sets. */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                          child: SparkPlan, partial: Boolean,
                          localGroups: Boolean = false) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    // zero keys = GLOBAL top-k: ClusteredDistribution(Nil) is rejected
    // by Catalyst — the single (empty-tuple) group needs all rows on one
    // partition, which is AllTuples (and the partial phase has already
    // reduced each partition to ≤ k rows, so the gather is tiny)
    else if (keys.isEmpty) org.apache.spark.sql.catalyst.plans.physical.AllTuples :: Nil
    else ClusteredDistribution(keys) :: Nil

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "heapKeys" -> SQLMetrics.createMetric(sparkContext, "in-memory heap keys (summed over tasks and flushes)"),
    "flushes" -> SQLMetrics.createMetric(sparkContext, "partial-phase bound-triggered flushes"))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val childOutput = child.output
    // binds + codegens lazily on first compare, serializes as the
    // SortOrder seq — the TakeOrderedAndProject pattern
    val ordering = new LazilyGeneratedOrdering(order, childOutput)
    val limit = k
    // the final phase may never flush (a key's rows would split across
    // two emitted heaps and the exact-top-k contract would break); its
    // input is already partial-reduced and hash-spread, so the map is
    // bounded by (keys in this cluster) × k
    val maxKeys =
      if (partial) conf.getConfString("spark.graft.topk.maxKeysInMemory", "262144").toInt
      else Int.MaxValue
    require(maxKeys >= 1, s"spark.graft.topk.maxKeysInMemory must be >= 1, got $maxKeys")
    val numOutputRows = longMetric("numOutputRows")
    val heapKeys = longMetric("heapKeys")
    val flushes = longMetric("flushes")
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val worstFirst = ordering.reverse
      import scala.jdk.CollectionConverters._
      new Iterator[InternalRow] {
        private var out: Iterator[InternalRow] = Iterator.empty
        // the row that hit the key bound — first row of the next run
        private var pending: InternalRow = null

        private def refill(): Unit = {
          while (!out.hasNext && (pending != null || iter.hasNext)) {
            val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
            var full = false
            while (!full && (pending != null || iter.hasNext)) {
              val row =
                if (pending != null) { val r = pending; pending = null; r }
                else iter.next()
              val key = keyProj(row)
              var heap = heaps.get(key)
              if (heap == null && heaps.size() >= maxKeys) {
                pending = row.copy() // belongs to the next run
                flushes += 1
                full = true
              } else {
                if (heap == null) {
                  heap = new java.util.PriorityQueue[InternalRow](limit, worstFirst)
                  heaps.put(key.copy(), heap)
                }
                if (heap.size() < limit) heap.add(row.copy())
                else if (ordering.compare(row, heap.peek()) < 0) {
                  heap.poll(); heap.add(row.copy())
                }
              }
            }
            heapKeys += heaps.size()
            out = heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
          }
        }

        override def hasNext: Boolean = { refill(); out.hasNext }
        override def next(): InternalRow = {
          refill()
          numOutputRows += 1
          out.next()
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override def simpleString(maxFields: Int): String =
    s"TopKPerKeyExec(${if (localGroups) "local" else if (partial) "partial" else "final"}, " +
      s"k=$k, keys=${keys.mkString("[", ", ", "]")})"
}

/** Key-predicate pushdown: a deterministic filter that references only
  * plain-attribute keys is constant within each group, so dropping whole
  * groups commutes with per-group top-k — push it below the node where
  * it can keep descending to the scan. Predicates touching non-key
  * columns must stay above (they would change which rows compete).
  *
  * Descent: on the `spark.sql.extensions` path (injectOptimizerRule)
  * this runs inside the main operatorOptimization batch, so the
  * standard pushdown rules keep moving the pushed filter toward the
  * scan for free. On [[graft.GraftExtensions.registerOn]]'s
  * `experimental.extraOptimizations` path it runs in the optimizer's
  * FINAL user-provided batch — after every built-in pushdown batch —
  * so the rule itself re-applies Catalyst's PushDownPredicates to
  * fixpoint on the rewritten subtree; both paths end with the filter
  * at the scan. */
object PushFilterThroughTopKPerKey extends Rule[LogicalPlan] with PredicateHelper {
  // bounded fixpoint: each application can descend the filter one or
  // more operators; plans are finite so this converges fast — the cap
  // only guards against a pathological rewrite cycle
  private def descend(plan: LogicalPlan): LogicalPlan = {
    var cur = plan
    var i = 0
    while (i < 20) {
      val next = org.apache.spark.sql.catalyst.optimizer.PushDownPredicates(cur)
      if (next.fastEquals(cur)) return cur
      cur = next
      i += 1
    }
    cur
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, t: TopKPerKeyNode) =>
      val keyAttrs = AttributeSet(t.keys.collect { case a: Attribute => a })
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(keyAttrs))
      if (push.isEmpty) f
      else {
        val pushed = t.copy(child = descend(Filter(push.reduce(And), t.child)))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}
