package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group top-k ranking — the capability behind the reference's
  * "top-5 best-selling items per month" (ESERCIZIO 1,
  * `/root/reference/BD_hw1/src/spark/TopFive.java:53-118`).
  *
  * The reference materializes whole groups (`groupByKey`) and take-5s an
  * *unsorted* iterable (SURVEY §2.7 Q2 — shuffle-order-dependent). Here:
  * window `row_number` over (orderCol desc, tieBreak asc). Spark ≥3.5
  * plans a `WindowGroupLimit` below the shuffle for rank-filter patterns,
  * so each map task forwards only its local top-k — at 100 TB the shuffle
  * carries O(groups × k), not O(rows).
  *
  * Tie-break is explicit and total so results are deterministic under any
  * partitioning (the property the reference violates).
  */
object TopK {

  def perGroup(df: DataFrame, groupCols: Seq[Column], orderCol: Column,
               tieBreak: Seq[Column], k: Int, rankName: String = "rn"): DataFrame = {
    val w = Window.partitionBy(groupCols: _*)
      .orderBy(orderCol.desc +: tieBreak.map(_.asc): _*)
    df.withColumn(rankName, row_number().over(w).cast("long"))
      .filter(col(rankName) <= k)
  }

  /** Same top-k-per-group capability on the native whole-operator path
    * ([[graft.plans.TopKPerKeyNode]] → TopKPerKeyStrategy →
    * TopKPerKeyExec): bounded heaps instead of sorts on both sides of
    * the exchange, with the partial phase shrinking the shuffle to ≤ k
    * rows per key per map partition. Same (orderCol desc, tieBreak asc)
    * semantics as [[perGroup]] minus the rank column; row sets are
    * identical when the tie-break is total (pinned in TopKNativeSpec).
    *
    * `localGroups = true` certifies each key's rows are CONTIGUOUS
    * within one partition (the broadcast-cross-join assignment shape,
    * keyed by the stream side's unique row id): the plan then runs one
    * heap pass with no exchange and no final phase — see
    * [[graft.plans.TopKPerKeyNode]] for the exact contract.
    */
  def perGroupNative(df: DataFrame, groupCols: Seq[String], orderCol: String,
                     tieBreak: Seq[String], k: Int,
                     localGroups: Boolean = false): DataFrame = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}
    import org.apache.spark.sql.graftbridge.PlanBridge
    graft.GraftExtensions.registerOn(df.sparkSession)
    // genuine UnresolvedAttributes (not Column wrappers, whose Spark-4
    // ColumnNodeExpression the analyzer only converts on the Dataset API
    // path) — generic ResolveReferences resolves these inside the node
    val keys = groupCols.map(UnresolvedAttribute.quoted)
    val order = SortOrder(UnresolvedAttribute.quoted(orderCol), Descending) +:
      tieBreak.map(c => SortOrder(UnresolvedAttribute.quoted(c), Ascending))
    PlanBridge.wrapUnary(df, child =>
      graft.plans.TopKPerKeyNode(keys, order, k, child, localGroups))
  }

  /** Native top-k plus the rank column [[perGroup]] emits: the heap
    * operator prunes to ≤ k rows per group first, then a window ranks
    * only the survivors — it reuses the final phase's hash partitioning
    * (no extra exchange) and sorts k rows per group instead of every
    * candidate. Same total order, so ranks match the window formulation
    * row for row. */
  def perGroupNativeRanked(df: DataFrame, groupCols: Seq[String], orderCol: String,
                           tieBreak: Seq[String], k: Int,
                           rankName: String = "rn"): DataFrame = {
    val top = perGroupNative(df, groupCols, orderCol, tieBreak, k)
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(orderCol).desc +: tieBreak.map(col(_).asc): _*)
    top.withColumn(rankName, row_number().over(w).cast("long"))
  }
}
