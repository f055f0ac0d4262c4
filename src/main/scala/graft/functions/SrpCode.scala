package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

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

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = math.min(dim, a.numElements())
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var code = 0L
      var p = 0
      while (p < planes) {
        val base = (t * planes + p) * dim
        var dot = 0.0
        var i = 0
        while (i < n) { dot += a.getFloat(i).toDouble * flat(base + i); i += 1 }
        if (dot >= 0.0) code |= (1L << p)
        p += 1
      }
      out(t) = code
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mat = ctx.addReferenceObj("srpPlanes", flat, "double[]")
      val out = ctx.freshName("out"); val n = ctx.freshName("n")
      val t = ctx.freshName("t"); val p = ctx.freshName("p"); val i = ctx.freshName("i")
      val code = ctx.freshName("code"); val dot = ctx.freshName("dot")
      val base = ctx.freshName("base")
      s"""
         |long[] $out = new long[$tables];
         |int $n = java.lang.Math.min($dim, $a.numElements());
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $code = 0L;
         |  for (int $p = 0; $p < $planes; $p++) {
         |    int $base = ($t * $planes + $p) * $dim;
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $dot += ((double) $a.getFloat($i)) * $mat[$base + $i];
         |    }
         |    if ($dot >= 0.0) $code |= (1L << $p);
         |  }
         |  $out[$t] = $code;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SrpCode =
    copy(child = newChild)

  override def prettyName: String = "srp_code"
}

object SrpCode {
  def apply(vec: Column, flat: Array[Double], dim: Int, planes: Int, tables: Int): Column =
    ColumnBridge.column(SrpCode(ColumnBridge.expression(vec), flat, dim, planes, tables))
}
