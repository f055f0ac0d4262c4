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
}
