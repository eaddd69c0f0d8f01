package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import graft.functions.DotProduct

/** Optimizer rule (SURVEY.md §4.3, injected via GraftExtensions): rewrites
  * the interpreted HOF dot-product idiom
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  *
  * into the native codegen [[DotProduct]] expression. The HOF form pays an
  * interpreted lambda call per element; the rewrite is bit-for-bit
  * equivalent (same sequential left-to-right double accumulation, and
  * IEEE `0.0 + x = x` makes the explicit zero seed a no-op), so results
  * and oracle hashes are unchanged — only the plan gets faster. Users of
  * the declarative idiom get the fused loop without knowing vec_dot exists.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _                        => false
  }

  private object MulLambda {
    def unapply(lf: LambdaFunction): Boolean = lf match {
      case LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _), Seq(a, b), _) =>
        (x.exprId == a.exprId && y.exprId == b.exprId) ||
          (x.exprId == b.exprId && y.exprId == a.exprId)
      case _ => false
    }
  }

  private object AddLambda {
    def unapply(lf: LambdaFunction): Boolean = lf match {
      case LambdaFunction(Add(x: NamedLambdaVariable, y: NamedLambdaVariable, _), Seq(acc, v), _) =>
        (x.exprId == acc.exprId && y.exprId == v.exprId) ||
          (x.exprId == v.exprId && y.exprId == acc.exprId)
      case _ => false
    }
  }

  private object IdentityLambda {
    def unapply(lf: LambdaFunction): Boolean = lf match {
      case LambdaFunction(x: NamedLambdaVariable, Seq(a), _) => x.exprId == a.exprId
      case _                                                 => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b, mul: LambdaFunction),
          Literal(0.0, DoubleType),
          add: LambdaFunction,
          fin: LambdaFunction)
        if MulLambda.unapply(mul) && AddLambda.unapply(add) && IdentityLambda.unapply(fin) &&
          isDoubleArray(a) && isDoubleArray(b) =>
      DotProduct(a, b)
  }
}
