package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native codegen'd SRP (signed-random-projection) bucket coder over an
  * ARRAY<FLOAT> vector: all `tables` × `planes` hyperplane dot products
  * in one fused pass, emitting one `planes`-bit sign code per table as
  * ARRAY<LONG>[tables].
  *
  * The composable formulation (per-plane `aggregate(zip_with(...))`
  * folds — see Similarity.srpBucketsHof) does not participate in
  * whole-stage codegen and allocates a zipped array per plane per row:
  * tables × planes interpreted vector walks. This expression is the
  * same pattern as [[CosineSimilarity]] (measured 57× there): one
  * codegen'd loop nest, zero allocation beyond the output array.
  *
  * Determinism: each dot product accumulates in ascending index order —
  * the exact fold order of the HOF formulation — so codes are
  * bit-identical (pinned by SrpSpec), which keeps every LSH bucket
  * assignment unchanged.
  *
  * @param flat hyperplane matrix flattened as [(table·planes + plane)·dim + i]
  */
case class SrpCode(child: Expression, flat: Array[Double],
                   dim: Int, planes: Int, tables: Int)
  extends UnaryExpression {

  require(flat.length == tables * planes * dim,
    s"hyperplane matrix has ${flat.length} values, expected tables*planes*dim = ${tables * planes * dim}")
  require(planes <= 63, s"planes must fit a long sign code, got $planes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"srp_code needs ARRAY<FLOAT> or ARRAY<DOUBLE>, got ${other.sql}")
    }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // HOF parity: a NULL vector, a NULL vector element, or a vector whose
  // length differs from dim (zip_with pads the short side with nulls)
  // all make every per-plane dot NULL in the composable formulation,
  // and `when(null >= 0)` falls to the otherwise branch: all bits
  // unset. Mirror all three here — including the NULL-input case, so
  // this expression is never null and NULL-vector rows keep flowing
  // into bucket 0 of every LSH table instead of being dropped by
  // posexplode.
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) new GenericArrayData(new Array[Long](tables))
    else evalNonNull(v)
  }

  private def evalNonNull(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val isF = elemIsFloat
    var hasNull = n != dim
    var i0 = 0
    while (i0 < n && !hasNull) { hasNull = a.isNullAt(i0); i0 += 1 }
    val out = new Array[Long](tables)
    if (!hasNull) {
      var t = 0
      while (t < tables) {
        var code = 0L
        var p = 0
        while (p < planes) {
          val base = (t * planes + p) * dim
          var dot = 0.0
          var i = 0
          while (i < n) {
            val x = if (isF) a.getFloat(i).toDouble else a.getDouble(i)
            dot += x * flat(base + i)
            i += 1
          }
          if (dot >= 0.0) code |= (1L << p)
          p += 1
        }
        out(t) = code
        t += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Not nullSafeCodeGen: a NULL input must still produce the all-zero
    // code array (see eval), so the child's null flag only skips the
    // dot-product loop, never the output assignment.
    val childGen = child.genCode(ctx)
    val a = childGen.value
    val mat = ctx.addReferenceObj("srpPlanes", flat, "double[]")
    val out = ctx.freshName("out"); val n = ctx.freshName("n")
    val t = ctx.freshName("t"); val p = ctx.freshName("p"); val i = ctx.freshName("i")
    val code = ctx.freshName("code"); val dot = ctx.freshName("dot")
    val base = ctx.freshName("base"); val hasNull = ctx.freshName("hasNull")
    val get = if (elemIsFloat) s"(double) $a.getFloat" else s"$a.getDouble"
    val body =
      s"""
         |long[] $out = new long[$tables];
         |if (!${childGen.isNull}) {
         |  int $n = $a.numElements();
         |  boolean $hasNull = $n != $dim;
         |  for (int $i = 0; $i < $n && !$hasNull; $i++) $hasNull = $a.isNullAt($i);
         |  if (!$hasNull) {
         |    for (int $t = 0; $t < $tables; $t++) {
         |      long $code = 0L;
         |      for (int $p = 0; $p < $planes; $p++) {
         |        int $base = ($t * $planes + $p) * $dim;
         |        double $dot = 0.0;
         |        for (int $i = 0; $i < $n; $i++) {
         |          $dot += ($get($i)) * $mat[$base + $i];
         |        }
         |        if ($dot >= 0.0) $code |= (1L << $p);
         |      }
         |      $out[$t] = $code;
         |    }
         |  }
         |}
       """.stripMargin
    ev.copy(
      code = childGen.code + code"""
        $body
        org.apache.spark.sql.catalyst.util.GenericArrayData ${ev.value} =
          new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SrpCode =
    copy(child = newChild)

  override def prettyName: String = "srp_code"
}

object SrpCode {
  def apply(vec: Column, flat: Array[Double], dim: Int, planes: Int, tables: Int): Column =
    ColumnBridge.column(SrpCode(ColumnBridge.expression(vec), flat, dim, planes, tables))
}
