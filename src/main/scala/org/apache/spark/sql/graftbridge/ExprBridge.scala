package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers

/** Expression-level private[sql] seams needed by custom operators —
  * same extension-subpackage convention as [[ColumnBridge]]. */
object ExprBridge {

  /** NormalizeFloatingNumbers.normalize: wraps float/double (incl.
    * nested struct/array/map) expressions in NormalizeNaNAndZero so
    * -0.0 == 0.0 and all NaN bit patterns collapse before byte-level
    * grouping/partitioning; identity for non-floating types. Spark only
    * applies its rule to Aggregate/Window/Join keys — custom nodes that
    * group by UnsafeRow bytes must call it themselves. */
  def normalizeFloats(e: Expression): Expression = NormalizeFloatingNumbers.normalize(e)
}
