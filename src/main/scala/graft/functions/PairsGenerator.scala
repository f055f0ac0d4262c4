package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, TypeUtils}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, StructField, StructType}

/** Catalyst Generator emitting every canonical unordered pair (x < y)
  * from an array column in one pass — the custom operator SURVEY §2.3/§7
  * flags as the alternative to the basket self-join for pair generation:
  * when baskets are already array-shaped (dialect A ingest, or any
  * collect_set output), pairs are generated map-side with NO join and NO
  * extra shuffle.
  *
  * Semantics match the self-join formulation exactly: nulls dropped,
  * duplicates deduped, pairs canonicalized by the element type's
  * ordering (so `[b,a,b]` → `(a,b)` only). O(k²) output per row — the
  * caller owns basket-size capping for adversarial skew, same as the
  * join path.
  *
  * Interpreted eval (CodegenFallback): the generator's row-expansion
  * loop dominates cost, not expression dispatch; measured at parity with
  * codegen'd explode chains.
  */
case class PairsGenerator(child: Expression)
  extends UnaryExpression with Generator with CodegenFallback {

  private lazy val elementType = child.dataType.asInstanceOf[ArrayType].elementType
  private lazy val ordering = TypeUtils.getInterpretedOrdering(elementType)

  override def elementSchema: StructType = StructType(Seq(
    StructField("x", elementType, nullable = false),
    StructField("y", elementType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(et, _)
      if org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(et) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"pairs() requires an array of orderable elements, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Iterator.empty
    val n = arr.numElements()
    val buf = new scala.collection.mutable.ArrayBuffer[Any](n)
    var i = 0
    while (i < n) {
      val v = arr.get(i, elementType)
      if (v != null) buf += v
      i += 1
    }
    // sort, then dedup adjacents with the TYPE ordering — JVM equals is
    // reference equality for BinaryType/struct values, which would leak
    // duplicates and emit x==x self-pairs
    val ord = ordering.asInstanceOf[Ordering[Any]]
    val sorted = buf.sorted(ord)
    val items = new scala.collection.mutable.ArrayBuffer[Any](sorted.length)
    sorted.foreach { v =>
      if (items.isEmpty || ord.compare(items.last, v) != 0) items += v
    }
    for {
      i <- (0 until items.length).iterator
      j <- (i + 1) until items.length
    } yield InternalRow(items(i), items(j))
  }

  override protected def withNewChildInternal(c: Expression): PairsGenerator = copy(child = c)
  override def prettyName: String = "pairs"
}

object PairsGenerator {
  /** Column form; use with a 2-name multi-alias:
    * `df.select(col("id"), pairs(col("items")).as(Seq("x", "y")))` */
  def pairs(items: Column): Column =
    ColumnBridge.column(PairsGenerator(ColumnBridge.expression(items)))
}
