package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native codegen'd position-agreement count over two ARRAY<LONG>
  * signatures — the MinHash Jaccard-estimate kernel. The composable
  * formulation (`aggregate(zip_with(..., when(x === y, 1)))`) is the
  * documented HOF perf trap (CLAUDE.md: aggregate() numeric folds don't
  * codegen; CosineSimilarity measured 57× vs the HOF): it allocates an
  * intermediate array per pair and evaluates interpreted, and it runs
  * once per CANDIDATE PAIR — the dominant row count out of the LSH band
  * join. This expression is one fused loop with a scalar counter,
  * inside whole-stage codegen, zero allocation. Pure integer count, so
  * the estimate (count/len in double) is bit-identical to the HOF
  * formulation and to the oracle's SQL replay.
  */
case class SigAgreement(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sig_agreement expects two ARRAY<LONG>, got $l and $r")
    }
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
         |int $c = 0;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SigAgreement =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sig_agreement"
}

object SigAgreement {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(SigAgreement(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
