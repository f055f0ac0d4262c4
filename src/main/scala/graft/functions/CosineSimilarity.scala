package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd cosine similarity over two ARRAY<FLOAT> or
  * ARRAY<DOUBLE> columns (either side may be either width — a float
  * element widens to double exactly, so mixing a float data vector
  * with a double centroid is lossless; the k-means loop needs exactly
  * that: round-1 centroids are frozen floats, later rounds are
  * double-valued means).
  *
  * The composable formulation (`aggregate(zip_with(...))`) allocates an
  * intermediate array per row and walks the vectors three times (dot,
  * ‖a‖, ‖b‖); this expression runs one fused loop with three scalar
  * accumulators, inside whole-stage codegen, zero allocation.
  *
  * Determinism: accumulators add in ascending index order — the exact
  * fold order of the HOF formulation and of DuckDB's list_dot_product —
  * so results are bit-identical with the oracle (CosineSpec pins
  * native == HOF equality).
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // Resolved once per plan, not per row: whether each side's elements
  // are stored as doubles (ARRAY<DOUBLE>) or floats (ARRAY<FLOAT>).
  @transient private lazy val leftIsDouble = CosineSimilarity.doubleElems(left)
  @transient private lazy val rightIsDouble = CosineSimilarity.doubleElems(right)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val ad = leftIsDouble; val bd = rightIsDouble
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (ad) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (bd) b.getDouble(i) else b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      def get(arr: String, isDouble: Boolean): String =
        if (isDouble) s"$arr.getDouble($i)" else s"(double) $arr.getFloat($i)"
      s"""
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${get(a, leftIsDouble)};
         |  double $y = ${get(b, rightIsDouble)};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_similarity"
}

object CosineSimilarity {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  private def doubleElems(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case ArrayType(FloatType, _)  => false
    case other => throw new IllegalArgumentException(
      s"cosine_similarity expects ARRAY<FLOAT> or ARRAY<DOUBLE>, got $other")
  }
}
