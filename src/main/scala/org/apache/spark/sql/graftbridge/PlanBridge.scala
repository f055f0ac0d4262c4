package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** DataFrame ⇄ LogicalPlan bridge for whole-operator extensions. Spark 4
  * keeps `Dataset.ofRows` and `Dataset.logicalPlan` private[sql]; custom
  * logical operators (graft.plans.TopKPerKeyNode) need both to wrap a
  * user DataFrame's plan and hand the result back as a DataFrame —
  * reached from an org.apache.spark.sql subpackage, the same extension
  * seam as [[ColumnBridge]].
  */
object PlanBridge {

  /** Wrap `df`'s logical plan with a new unary operator and return the
    * result as a DataFrame of the same session. */
  def wrapUnary(df: DataFrame, build: LogicalPlan => LogicalPlan): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    classic.Dataset.ofRows(ds.sparkSession, build(ds.logicalPlan))
  }
}
