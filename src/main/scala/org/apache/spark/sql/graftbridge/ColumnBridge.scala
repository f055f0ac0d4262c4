package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 hid the direct constructors
  * behind `private[sql] ExpressionUtils` (the Connect column-node
  * refactor); extension libraries reach them from a subpackage of
  * org.apache.spark.sql — the conventional extension seam, same access
  * level the built-in function registry uses.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
