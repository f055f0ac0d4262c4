package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.DotProduct

/** Optimizer rule: rewrites the declarative dot-product pattern
  *
  *   aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, v) => acc + v)
  *
  * (with optional to-double casts inside the multiply, as written by
  * `Similarity.dot` and by any user composing HOFs) into the fused
  * codegen'd [[DotProduct]] kernel. HOF numeric folds run interpreted
  * (measured 57× on the cosine kernel), so users writing the natural
  * declarative form silently get the fast path; results are
  * bit-identical because the kernel preserves fold order and null
  * semantics (FuseDotProductSpec pins both).
  *
  * Installed via GraftExtensions (injectOptimizerRule at session build,
  * experimental.extraOptimizations for existing sessions) — runs after
  * the standard batches, so constant folding and cast simplification
  * have already normalized the pattern.
  */
object FuseDotProduct extends Rule[LogicalPlan] {

  private def toDouble(e: Expression): Expression = e match {
    case Cast(c, DoubleType, _, _) => toDouble(c)
    case other => other
  }

  /** Both operands are exactly the lambda's two variables (either
    * order), modulo to-double casts. */
  private def usesBothVars(l: Expression, r: Expression,
                           vars: Seq[NamedExpression]): Boolean = {
    val ids = vars.collect { case v: NamedLambdaVariable => v.exprId }.toSet
    (toDouble(l), toDouble(r)) match {
      case (a: NamedLambdaVariable, b: NamedLambdaVariable) =>
        ids == Set(a.exprId, b.exprId) && a.exprId != b.exprId
      case _ => false
    }
  }

  private def supportedElem(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(m: Multiply, mArgs, _)),
          Literal(0.0, DoubleType),
          LambdaFunction(add: Add, aArgs, _),
          LambdaFunction(fin: NamedLambdaVariable, fArgs, _))
        if supportedElem(a) && supportedElem(b) &&
          // the multiply itself must run in DOUBLE precision (casts
          // present, or double inputs): a float×float multiply rounds
          // to float before widening, and the fused kernel's double
          // multiply would change low bits — skip those, bit-identity
          // is the rule's contract
          m.dataType == DoubleType &&
          usesBothVars(m.left, m.right, mArgs) &&
          usesBothVars(add.left, add.right, aArgs) &&
          fArgs.collect { case v: NamedLambdaVariable => v.exprId }.contains(fin.exprId) =>
      DotProduct(a, b)
  }
}
